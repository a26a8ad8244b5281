#!/usr/bin/env python3
"""Per-layer time breakdown of the merged VideoMAE program on the TPU.

Answers VERDICT-r2 item 2: where does the non-peak time go? For every
layer i (token count N_i from the static schedule) this measures, with
the scan-chained DCE-safe timer:

  - ``merged_ms``   — the full ToMe block (attention + matcher + merge
                      + MLP) at N_i,
  - ``nomerge_ms``  — an r=0 block at the same N_i (attention + MLP
                      only) => ``merged - nomerge`` isolates the
                      matcher+merge overhead per layer,
  - analytic MXU FLOPs at N_i => per-layer effective TFLOP/s and MFU
    against the same bf16 peak probe bench.py uses.

Plus the stem (TubeletEmbed+pos) and head, and the whole-model time so
the sum-of-parts vs end-to-end gap (inter-layer fusion + dispatch) is
visible. Writes PROFILE_MERGED.json.

Run: python tools/profile_merged.py   (real TPU; ~5 min warm cache)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vtm.utils.env import setup_environment  # noqa: E402

setup_environment()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vtm.merge.policy import MergePolicy, MergeState  # noqa: E402
from vtm.models.videomae import (  # noqa: E402
    VideoMAE, VideoMAEBlock, VideoMAEConfig,
)
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def block_flops(n: int, c: int = 768, mlp: int = 3072, r: int = 0) -> float:
    """MXU flops of one ViT block at n tokens (qkv, attn, proj, mlp)
    + the matcher's score matmul when r > 0."""
    f = 2 * n * c * 3 * c          # qkv
    f += 2 * n * n * c * 2         # qk^T + av
    f += 2 * n * c * c             # proj
    f += 2 * n * c * mlp * 2       # fc1 + fc2
    if r > 0:
        half = n // 2
        f += 2 * half * half * c   # a @ b^T scores
    return float(f)


def main():
    # lease-health probe with recovery patience (see bench.py)
    sys.path.insert(0, str(REPO))
    from bench import _probe_device

    _probe_device()
    batch = int(os.environ.get("VTM_PROFILE_BATCH", "8"))
    r = 150
    iters = int(os.environ.get("VTM_PROFILE_ITERS", "20"))
    dtype = jnp.bfloat16
    config = VideoMAEConfig(num_classes=400)
    policy = MergePolicy(rs=(r,) * 12, mode="merge", prop_attn=False)
    counts = list(policy.token_counts(config.tokens))

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((batch, 16, 224, 224, 3)), jnp.float32
    )
    model = VideoMAE(config=config, policy=policy, dtype=dtype)
    params = model.init(jax.random.key(0), video[:1])["params"]
    rtt = host_roundtrip_latency()

    # whole model
    whole_s = chained_seconds(
        lambda p, v: model.apply({"params": p}, v)[0], video, iters,
        rtt=rtt, params=params,
    )
    base = VideoMAE(
        config=config, policy=MergePolicy(rs=(0,) * 12, mode="none"),
        dtype=dtype,
    )
    base_s = chained_seconds(
        lambda p, v: base.apply({"params": p}, v)[0], video, iters,
        rtt=rtt, params=params,
    )

    # bf16 peak: nominal when the device kind is known (the probe has
    # been observed above spec on the tunneled chip), else the probe
    from bench import nominal_or_probe_peak

    m = jnp.ones((4096, 4096), jnp.bfloat16)
    peak = 2 * 4096 ** 3 * 50 / chained_seconds(
        lambda v: v @ v, m, 50, rtt=rtt
    ) / 1e12
    peak = nominal_or_probe_peak(str(jax.devices()[0]), peak)

    layers = []
    for i, n in enumerate(counts[:-1]):
        x = jnp.asarray(
            rng.standard_normal((batch, n, 768)), dtype
        )
        size = jnp.ones((batch, n, 1), jnp.float32)
        blk = VideoMAEBlock(
            config, MergePolicy(rs=(r,), mode="merge", prop_attn=False),
            dtype=dtype,
        )
        merged_s = chained_seconds(
            lambda p, v: blk.apply(
                {"params": p}, v, MergeState(size=size), layer=0
            )[0],
            x, iters, rtt=rtt, params=params[f"blocks_{i}"],
        )
        blk0 = VideoMAEBlock(
            config, MergePolicy(rs=(0,), mode="none"), dtype=dtype
        )
        plain_s = chained_seconds(
            lambda p, v: blk0.apply(
                {"params": p}, v, MergeState(size=None), layer=0
            )[0],
            x, iters, rtt=rtt, params=params[f"blocks_{i}"],
        )
        fl = block_flops(n, r=r)
        ms = merged_s / iters * 1e3
        row = dict(
            layer=i,
            n=n,
            merged_ms=round(ms, 4),
            nomerge_ms=round(plain_s / iters * 1e3, 4),
            matcher_merge_ms=round((merged_s - plain_s) / iters * 1e3, 4),
            flops=fl,
        )
        if ms >= 0.02:  # below this the rtt subtraction dominates
            row.update(
                eff_tflops=round(fl * batch / (merged_s / iters) / 1e12, 1),
                mfu=round(fl * batch / (merged_s / iters) / 1e12 / peak, 4),
            )
        else:
            row["note"] = "below timing floor (sub-rtt)"
        layers.append(row)
        print(json.dumps(layers[-1]), flush=True)

    sum_parts_ms = sum(l["merged_ms"] for l in layers)
    whole_ms = whole_s / iters * 1e3
    out = dict(
        device=str(jax.devices()[0]),
        batch=batch,
        r=r,
        peak_bf16_tflops_probe=round(peak, 1),
        whole_model_ms=round(whole_ms, 3),
        baseline_model_ms=round(base_s / iters * 1e3, 3),
        sum_block_ms=round(sum_parts_ms, 3),
        stem_head_other_ms=round(whole_ms - sum_parts_ms, 3),
        total_matcher_merge_ms=round(
            sum(l["matcher_merge_ms"] for l in layers), 3
        ),
        layers=layers,
    )
    name = (
        "PROFILE_MERGED.json" if batch == 8
        else f"PROFILE_MERGED_B{batch}.json"
    )
    (REPO / name).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "layers"}))


if __name__ == "__main__":
    main()
