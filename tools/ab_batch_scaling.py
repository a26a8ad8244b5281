#!/usr/bin/env python3
"""Per-component batch-scaling A/B for the ViT-B block: why is the
merged VideoMAE program 5%/14% slower PER CLIP at batch 16/32 than at
batch 8 (BENCH_DETAIL.json batch_sweep; PROFILE_MERGED_B32.json shows
every big-N block 12-31% slower per clip)?

Measures, in ONE process/run (so cross-run chip drift can't fake a
trend), ms-per-clip at batch 8/16/32 for:

  block      — the full r=0 VideoMAEBlock at n=1418 (layer-1 shape)
  attn       — the fused Pallas attention alone [b,12,n,64]
  qkv        — x @ W_qkv matmul alone
  mlp        — fc1+gelu+fc2 alone
  matcher    — bipartite matching + merge at r=150

Writes PROFILE_BATCH_SCALING.json.
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

from vtm.merge.policy import MergePolicy, MergeState  # noqa: E402
from vtm.models.videomae import VideoMAEBlock, VideoMAEConfig  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402

N = 1418
D, H, HD, MLP = 768, 12, 64, 3072


def main():
    from bench import _probe_device

    _probe_device()
    iters = 20
    dtype = jnp.bfloat16
    config = VideoMAEConfig(num_classes=400)
    rng = np.random.default_rng(0)
    rtt = host_roundtrip_latency()

    blk = VideoMAEBlock(
        config, MergePolicy(rs=(0,), mode="none"), dtype=dtype
    )
    blk_m = VideoMAEBlock(
        config, MergePolicy(rs=(150,), mode="merge", prop_attn=False),
        dtype=dtype,
    )
    params = blk.init(
        jax.random.key(0),
        jnp.zeros((1, N, D), dtype), MergeState(size=None), layer=0,
    )["params"]
    w_qkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, dtype)
    w1 = jnp.asarray(rng.standard_normal((D, MLP)) * 0.02, dtype)
    w2 = jnp.asarray(rng.standard_normal((MLP, D)) * 0.02, dtype)

    from vtm.ops.flash_attention import tome_flash_attention

    out = {"device": str(jax.devices()[0]), "n": N, "iters": iters,
           "rows": {}}
    for b in [8, 16, 32]:
        x = jnp.asarray(rng.standard_normal((b, N, D)), dtype)
        q = jnp.asarray(rng.standard_normal((b, H, N, HD)), dtype)
        k = jnp.asarray(rng.standard_normal((b, H, N, HD)), dtype)
        v = jnp.asarray(rng.standard_normal((b, H, N, HD)), dtype)
        size = jnp.ones((b, N, 1), jnp.float32)

        stages = {
            "block": lambda p, z: blk.apply(
                {"params": p}, z, MergeState(size=None), layer=0
            )[0],
            "block_merged": lambda p, z: blk_m.apply(
                {"params": p}, z, MergeState(size=size), layer=0
            )[0],
            # one-arg forms: chained_seconds calls apply_fn(v) when
            # params is None
            "attn": lambda z: tome_flash_attention(z, k, v, None, 0.125),
            "qkv": lambda z: z @ w_qkv,
            "mlp": lambda z: jax.nn.gelu(z @ w1) @ w2,
        }
        row = {}
        for name, fn in stages.items():
            inp = q if name == "attn" else x
            p = params if name.startswith("block") else None
            secs = chained_seconds(fn, inp, iters, rtt=rtt, params=p)
            row[name] = round(secs / iters / b * 1e3, 5)  # ms/clip
        out["rows"][str(b)] = row
        print(b, json.dumps(row), flush=True)

    (REPO / "PROFILE_BATCH_SCALING.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
