#!/usr/bin/env python3
"""On-chip A/B: einsum vs fused-kernel attention at SMALL N, post-n8.

The `_FLASH_MIN_SEQ* = 256` thresholds in vtm/models/common.py were
measured (round 3) against the old 128-lane-padded kernel, which padded
TimeSformer's N=197 to 256 (+30% logits work and three whole-tensor pad
passes). The round-4 n8 forward pads 197 -> 200 only, so the crossover
may have moved below 197 — the regime every merged TimeSformer spatial
layer lives in (bt=64 rows from folding frames into batch).

Measures the PRODUCTION dispatch both ways by overriding the module
thresholds around `attention_core` (so the CLS-excluded kernel path
includes its real separate-CLS-row + concat epilogue):

  unbiased      b=8,  h=12  (merged VideoMAE tail layers)
  biased        b=8,  h=12  (ViViT proportional-attn, full bias)
  biased_cls    bt=64, h=12 (TimeSformer CLS-excluded rank-1 bias)

Writes PROFILE_SMALL_N.json. All dispatched work is fetched before
exit (lease safety).
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vtm.utils.env import setup_environment  # noqa: E402

setup_environment()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vtm.models import common  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def _core(mode, q, k, v, scale, size_bias, force):
    """attention_core with the dispatch forced to einsum or kernel."""
    old = (common._FLASH_MIN_SEQ, common._FLASH_MIN_SEQ_BIASED)
    thr = 0 if force == "kernel" else 10**9
    common._FLASH_MIN_SEQ = common._FLASH_MIN_SEQ_BIASED = thr
    try:
        return common.attention_core(
            q, k, v, scale,
            size_bias=size_bias,
            bias_excludes_first=(mode == "biased_cls"),
        )
    finally:
        common._FLASH_MIN_SEQ, common._FLASH_MIN_SEQ_BIASED = old


def main():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    path = REPO / "PROFILE_SMALL_N.json"

    def record(key, val):
        out["rows"][key] = val
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: val}), flush=True)

    rng = np.random.default_rng(0)
    H, D = 12, 64
    scale = 1.0 / np.sqrt(D)
    # The merged-VideoMAE tail rows (b=8, N<=368) are ~2% of model time
    # and sit at the timing floor — only the TimeSformer-regime
    # CLS-excluded crossover is actionable (where does the n8 kernel
    # overtake the fused rank-1 einsum at bt=64?).
    cases = [
        ("biased_cls", 64, n) for n in (197, 256, 320, 384, 448, 512)
    ]
    for mode, b, n in cases:
        q = jnp.asarray(rng.standard_normal((b, H, n, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, H, n, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, H, n, D)), jnp.bfloat16)
        if mode == "unbiased":
            sb = None
        else:
            kn = n - 1 if mode == "biased_cls" else n
            sb = jnp.asarray(
                np.log(rng.uniform(1, 12, (b, 1, 1, kn))), jnp.float32
            )
        iters = 300
        row = {}
        ref = None
        for force in ("einsum", "kernel"):
            got = np.asarray(
                _core(mode, q, k, v, scale, sb, force), np.float32
            )
            if ref is None:
                ref = got
            else:
                row["rel_err"] = round(
                    float(np.abs(got - ref).max() / np.abs(ref).max()), 6
                )
            secs = chained_seconds(
                lambda a: _core(mode, a[0], a[1], a[2], scale, sb, force),
                (q, k, v), iters, rtt=rtt,
            )
            row[force + "_ms"] = round(secs / iters * 1e3, 4)
        row["kernel_wins"] = row["kernel_ms"] < row["einsum_ms"]
        record(f"{mode}_b{b}_n{n}", row)


if __name__ == "__main__":
    main()
