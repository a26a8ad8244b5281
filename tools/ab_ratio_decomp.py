#!/usr/bin/env python3
"""Whole-program decomposition of the merged/baseline speedup gap.

BENCH_DETAIL puts the headline at ~89% of the XLA FLOP-ideal ratio.
The per-layer profile (PROFILE_MERGED.json) is too noisy on this
tunneled chip to localize the missing ~2 ms (its matcher_merge column
sums to a *negative* number). This tool measures only WHOLE programs —
long enough to sit far above the timing floor — inside one process:

  whole_base    r=0 VideoMAE (stem + 12 N=1568 blocks + head)
  whole_merged  r=150 merged VideoMAE (the headline program)
  chain_base    12 plain blocks at N=1568 (no stem/head)
  chain_sliced  12 plain blocks at the merged token counts, each
                preceded by a free x[:, :n_i] slice — FLOP-shaped like
                the merged program but with ZERO merge machinery
                (no matcher, no one-hot wavg, no size state)

With XLA-counted FLOPs F for each program, the headline excess
  excess_total = whole_merged - (F_m / F_b) * whole_base
splits into
  stem/head amortization:  (whole_base - chain_base) * (1 - F_m/F_b)
  N-scaling loss:          chain_sliced - (F_cs/F_cb) * chain_base
  merge machinery:         (whole_merged - stem_head - chain_sliced)
                           - (F_m - F_cs - (F_b - F_cb)) / F_cb
                             * chain_base
  residual:                whatever drift keeps for itself

Writes PROFILE_RATIO_DECOMP.json.
Run: python tools/ab_ratio_decomp.py   (real TPU, ~5 min warm)
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


def main():
    from bench import _probe_device, program_flops

    _probe_device()
    batch = int(os.environ.get("VTM_PROFILE_BATCH", "8"))
    iters = int(os.environ.get("VTM_PROFILE_ITERS", "20"))
    r = 150
    dtype = jnp.bfloat16
    config = VideoMAEConfig(num_classes=400)
    policy = MergePolicy(rs=(r,) * 12, mode="merge", prop_attn=False)
    counts = list(policy.token_counts(config.tokens))[:12]

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((batch, 16, 224, 224, 3)), jnp.float32
    )
    merged = VideoMAE(config=config, policy=policy, dtype=dtype)
    params = merged.init(jax.random.key(0), video[:1])["params"]
    base = VideoMAE(
        config=config, policy=MergePolicy(rs=(0,) * 12, mode="none"),
        dtype=dtype,
    )
    blk0 = VideoMAEBlock(
        config, MergePolicy(rs=(0,), mode="none"), dtype=dtype
    )
    x0 = jnp.asarray(rng.standard_normal((batch, counts[0], 768)), dtype)

    def chain_base_fn(p, x):
        for i in range(12):
            x = blk0.apply(
                {"params": p[f"blocks_{i}"]}, x, MergeState(size=None),
                layer=0,
            )[0]
        return x

    def chain_sliced_fn(p, x):
        for i, n in enumerate(counts):
            x = blk0.apply(
                {"params": p[f"blocks_{i}"]}, x[:, :n],
                MergeState(size=None), layer=0,
            )[0]
        return x

    rtt = host_roundtrip_latency()

    def flops_of(fn, *args) -> float:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))

    F_b = program_flops(base, params, video)
    F_m = program_flops(merged, params, video)
    F_cb = flops_of(chain_base_fn, params, x0)
    F_cs = flops_of(chain_sliced_fn, params, x0)

    progs = {
        "whole_base": lambda: chained_seconds(
            lambda p, v: base.apply({"params": p}, v)[0], video, iters,
            rtt=rtt, params=params),
        "whole_merged": lambda: chained_seconds(
            lambda p, v: merged.apply({"params": p}, v)[0], video, iters,
            rtt=rtt, params=params),
        "chain_base": lambda: chained_seconds(
            chain_base_fn, x0, iters, rtt=rtt, params=params),
        "chain_sliced": lambda: chained_seconds(
            chain_sliced_fn, x0, iters, rtt=rtt, params=params),
    }
    # two interleaved passes; keep the per-program minimum (drift guard)
    ms = {k: float("inf") for k in progs}
    for rep in range(2):
        for k, f in progs.items():
            ms[k] = min(ms[k], f() / iters * 1e3)
            print(json.dumps({"rep": rep, k: round(ms[k], 3)}), flush=True)

    stem_head = ms["whole_base"] - ms["chain_base"]
    flop_ratio = F_m / F_b
    excess_total = ms["whole_merged"] - flop_ratio * ms["whole_base"]
    amort = stem_head * (1 - flop_ratio)
    n_scaling = ms["chain_sliced"] - (F_cs / F_cb) * ms["chain_base"]
    mach_flops = F_m - F_cs - (F_b - F_cb)
    machinery = (
        ms["whole_merged"] - stem_head - ms["chain_sliced"]
        - mach_flops / F_cb * ms["chain_base"]
    )
    out = dict(
        device=str(jax.devices()[0]),
        batch=batch,
        iters=iters,
        r=r,
        ms={k: round(v, 3) for k, v in ms.items()},
        flops=dict(
            whole_base=F_b, whole_merged=F_m,
            chain_base=F_cb, chain_sliced=F_cs,
            merge_machinery=mach_flops,
        ),
        flop_ratio=round(flop_ratio, 4),
        stem_head_ms=round(stem_head, 3),
        excess_total_ms=round(excess_total, 3),
        split=dict(
            stem_head_amortization_ms=round(amort, 3),
            n_scaling_loss_ms=round(n_scaling, 3),
            merge_machinery_excess_ms=round(machinery, 3),
            residual_ms=round(excess_total - amort - n_scaling - machinery, 3),
        ),
    )
    (REPO / "PROFILE_RATIO_DECOMP.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
