#!/usr/bin/env python3
"""On-chip sweep of the token-major per-frame attention kernel's two
knobs at the Motionformer production shape (B8 H12 N1568 d64 f8 bf16):

  VTM_FRAME_TM_GROUP — heads per program (wider contiguous output-DMA
    chunks vs more fp32 logits VMEM -> smaller blk_q)
  VTM_FRAME_TM_FCS   — frames per grid step (bigger K/V blocks + logits
    tiles vs fewer grid steps)

The production default is (group=2, fcs=2). PERF_NOTES.md attributes
the spatial stage's 12%-MFU residual to strided 256-byte output DMA
chunks; an all-heads program (group=12) writes full 1536-byte rows at
the cost of ~11 MB of logits VMEM (blk_q 224). This measures the whole
grid. Writes PROFILE_FRAME_TM.json. All dispatched work is fetched
before exit.
"""

import itertools
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

B, H, N, D, F = 8, 12, 1568, 64, 8


def main():
    # lease-health probe with recovery patience (see bench.py)
    from bench import _probe_device

    _probe_device()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)

    rtt = host_roundtrip_latency()
    iters = 30
    out = {
        "device": str(jax.devices()[0]),
        "shape": f"B{B} H{H} N{N} d{D} f{F} bf16",
        "iters": iters,
    }

    # reference output for parity (production config)
    os.environ.pop("VTM_FRAME_TM_GROUP", None)
    os.environ.pop("VTM_FRAME_TM_FCS", None)
    ref = np.asarray(
        fa._frame_forward_tm(q, k, v, None, scale, F, 784), np.float32
    )

    groups = [2, 4, 6, 12]
    fcss = [1, 2, 4, 8]
    rows = {}
    for g, fcs in itertools.product(groups, fcss):
        key = f"g{g}_fcs{fcs}"
        os.environ["VTM_FRAME_TM_GROUP"] = str(g)
        os.environ["VTM_FRAME_TM_FCS"] = str(fcs)
        try:
            got = np.asarray(
                fa._frame_forward_tm(q, k, v, None, scale, F, 784),
                np.float32,
            )
            err = float(np.abs(got - ref).max())
            secs = chained_seconds(
                lambda z: fa._frame_forward_tm(z, k, v, None, scale, F, 784),
                q, iters, rtt=rtt,
            )
            rows[key] = {"ms": round(secs / iters * 1e3, 4), "maxerr": err}
        except Exception as e:
            # axon compile errors carry multi-KB HTTP dumps; keep the head
            rows[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(key, rows[key], flush=True)
    os.environ.pop("VTM_FRAME_TM_GROUP", None)
    os.environ.pop("VTM_FRAME_TM_FCS", None)

    out["rows"] = rows
    ok = {k2: r["ms"] for k2, r in rows.items() if "ms" in r}
    if ok:
        best = min(ok, key=ok.get)
        out["best"] = {"config": best, "ms": ok[best],
                       "default_ms": ok.get("g2_fcs2")}
    (REPO / "PROFILE_FRAME_TM.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out.get("best", {})))


if __name__ == "__main__":
    main()
