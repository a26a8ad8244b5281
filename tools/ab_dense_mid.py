#!/usr/bin/env python3
"""Mid-schedule dense-attention block-choice A/B (standalone kernel).

The refreshed per-layer profile (PROFILE_MERGED.json) shows the
whole-row n8 layers (N<=1144) running 10-20% hotter than the chunked
ones just above the 1152 threshold (N=1418 -> blk 712 x2 chunks: 78.5
block TF/s; N=968 whole-row: 97.4) — but block rows mix attention with
roofline matmuls, so this measures the KERNEL alone, interleaved
within one process (chip drift control), at the merged VideoMAE
mid-schedule shapes:

  N=1418: production (1424, 712)  vs whole-row (1424, 1424)
  N=1268: production (1272, 424)  vs padded (1280, 640) vs
          whole-row (1272, 1272)
  N=1568: production (1568, 784)  vs whole-row (1568, 1568)

Whole-row variants above ~1144 may fail to compile (fp32 logits tile
6.5-9.8 MB); failures are recorded, not fatal. Variants are forced by
monkeypatching flash_attention._fwd_pick. Writes PROFILE_DENSE_MID.json.
Run: python tools/ab_dense_mid.py   (real TPU)
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

from vtm.ops import flash_attention as fa  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402

B, H, D = 8, 12, 64
CASES = {
    1418: [(1424, 712), (1424, 1424)],
    1268: [(1272, 424), (1280, 640), (1272, 1272)],
    1568: [(1568, 784), (1568, 1568)],
}
REPS = 3


def main():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    iters = int(os.environ.get("VTM_BENCH_ITERS", "30"))
    rng = np.random.default_rng(0)
    out = {"device": jax.devices()[0].device_kind, "iters": iters, "cases": {}}
    orig_pick = fa._fwd_pick

    for n, variants in CASES.items():
        q = jnp.asarray(rng.standard_normal((B, H, n, D)), jnp.bfloat16)
        rows = {}
        fns = {}
        for n8, blk in variants:
            def make(n8=n8, blk=blk):
                def run(x):
                    fa._fwd_pick = lambda _n, _hi: (n8, blk)
                    try:
                        return fa.tome_flash_attention(x, x, x, sm_scale=0.125)
                    finally:
                        fa._fwd_pick = orig_pick
                return run
            fns[(n8, blk)] = make()
        for rep in range(REPS):
            for (n8, blk), fn in fns.items():
                key = f"n8={n8} blk={blk}"
                if rows.get(key) == "compile_failed":
                    continue
                try:
                    sec = chained_seconds(fn, q, iters=iters, rtt=rtt)
                except Exception as e:  # noqa: BLE001
                    rows[key] = "compile_failed"
                    print(f"N={n} {key}: FAIL {type(e).__name__} "
                          f"{str(e)[:120]}", flush=True)
                    continue
                ms = sec / iters * 1e3
                flops = 2 * 2 * B * H * n8 * n8 * D
                rows.setdefault(key, []).append(
                    {"ms": round(ms, 4),
                     "tflops": round(flops / (ms / 1e3) / 1e12, 1)}
                )
                print(f"N={n} rep{rep} {key}: {ms:.4f} ms "
                      f"{flops / (ms / 1e3) / 1e12:.1f} TF/s", flush=True)
        out["cases"][f"N={n}"] = rows

    path = REPO / "PROFILE_DENSE_MID.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
