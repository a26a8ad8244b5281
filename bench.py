#!/usr/bin/env python3
"""Headline benchmark: clips/sec/chip for VideoMAE ViT-B (16x224) with
token merging, vs the unmerged baseline measured on the same chip.

Matches the reference's headline row (BASELINE.md: VideoMAE r=150 merge
2.55x speedup, measured with tools/model_benchmark.py batch 8): same
model, same r, same batch. ``vs_baseline`` is the merged/unmerged
speedup on this chip.

Prints ONE JSON line:
  {"metric": ..., "value": clips/sec merged, "unit": "clips/s",
   "vs_baseline": merged/unmerged speedup}

Timing notes: remote-TPU backends may not block in block_until_ready,
so each measurement chains ``iters`` forwards inside one jitted
lax.scan (data stays on device, iterations serialize through a
zero-scaled logits feedback) and fetches a scalar at the end; the
host round-trip is measured separately and subtracted.

Env knobs: VTM_BENCH_ITERS (default 20), VTM_BENCH_BATCH (default 8),
VTM_BENCH_R (default 150), VTM_BENCH_DTYPE (default bfloat16).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from vtm.utils.env import setup_environment  # noqa: E402

setup_environment()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vtm.merge.policy import MergePolicy  # noqa: E402
from vtm.models.videomae import VideoMAE, VideoMAEConfig  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def measure(module, params, x, iters: int, rtt: float) -> float:
    """clips/sec over ``iters`` chained forward passes."""
    secs = chained_seconds(
        lambda p, v: module.apply({"params": p}, v)[0], x, iters, rtt=rtt,
        params=params,
    )
    return x.shape[0] * iters / secs


def main():
    iters = int(os.environ.get("VTM_BENCH_ITERS", "20"))
    batch = int(os.environ.get("VTM_BENCH_BATCH", "8"))
    r = int(os.environ.get("VTM_BENCH_R", "150"))
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("VTM_BENCH_DTYPE", "bfloat16")
    ]

    config = VideoMAEConfig(num_classes=400)  # ViT-B/16, 16 frames, 224
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, 16, 224, 224, 3)), dtype=jnp.float32
    )

    base = VideoMAE(config=config, policy=MergePolicy(rs=(0,) * 12, mode="none"), dtype=dtype)
    params = base.init(jax.random.key(0), x[:1])["params"]

    # headline config: constant r, PROP_ATTN False (experiments.sh:33)
    merged = VideoMAE(
        config=config,
        policy=MergePolicy(rs=(r,) * 12, mode="merge", prop_attn=False),
        dtype=dtype,
    )

    rtt = host_roundtrip_latency()
    base_cps = measure(base, params, x, iters, rtt)
    merged_cps = measure(merged, params, x, iters, rtt)

    print(
        json.dumps(
            {
                "metric": f"clips_per_sec_per_chip_videomae_vitb_r{r}",
                "value": round(merged_cps, 3),
                "unit": "clips/s",
                "vs_baseline": round(merged_cps / base_cps, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
