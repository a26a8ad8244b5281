#!/usr/bin/env python3
"""Batch-32 attention working-set A/B with the n8 kernel (VERDICT-r3
item 2): interleaved b8/b32 measurements (chip drift control) of the
standalone kernel at the layer-0 shape across block-size variants, plus
a grid-order swap probe.

Round-3 diagnosis (PERF_NOTES): the b32 per-clip penalty tracks the
total live q/k/v working set (HBM locality across grid steps); chunked
dispatch measured negative. The n8 kernel removed the pad copies (the
working set shrank 2x) — this re-measures and tries what round 3
didn't: smaller kv/q blocks (392), whole-row (1568), and kv-refetch
grid order. Writes PROFILE_B32.json; all work fetched before exit.
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vtm.ops import flash_attention as fa  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402

B8, B32, H, N, D = 8, 32, 12, 1568, 64


def grid_swapped(q, k, v, sm_scale, blk=784):
    """Same n8 kernel but grid (qi, bh): bh varies fastest -> k/v
    refetch every program (locality-hypothesis control)."""
    b, h, n, d = q.shape
    n8 = n
    kernel = fa._make_n8_kernel(n, n8, blk, d, sm_scale, False)
    qs = q.reshape(b * h, n, d)
    ks = k.reshape(b * h, n, d)
    vs = v.reshape(b * h, n, d)
    out = pl.pallas_call(
        kernel,
        grid=(n8 // blk, b * h),
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda qi, bh: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n8, d), lambda qi, bh: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n8, d), lambda qi, bh: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda qi, bh: (bh, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n8, d), q.dtype),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs)
    return out.reshape(b, h, n, d)


def main():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    path = REPO / "PROFILE_B32.json"

    def record(key, val):
        out["rows"][key] = val
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: val}), flush=True)

    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(D)
    data = {}
    for b in (B8, B32):
        data[b] = tuple(
            jnp.asarray(rng.standard_normal((b, H, N, D)), jnp.bfloat16)
            for _ in range(3)
        )

    def time_var(tag, b, fn, iters):
        q, k, v = data[b]
        secs = chained_seconds(lambda a: fn(*a), (q, k, v), iters, rtt=rtt)
        ms = secs / iters * 1e3
        record(tag, {"ms": round(ms, 4), "ms_per_clip": round(ms / b, 5)})
        return ms / b

    # interleaved: each variant measured at b8 then b32 back-to-back,
    # repeated twice (drift control)
    variants = [
        ("blk784", lambda q, k, v: fa.tome_flash_attention(q, k, v, None, scale)),
        ("blk392", None),
        ("blk1568", None),
        ("gridswap784", lambda q, k, v: grid_swapped(q, k, v, scale, 784)),
    ]
    for rep in range(2):
        for name, fn in variants:
            if name.startswith("blk") and fn is None:
                os.environ["VTM_DENSE_BLK"] = name[3:]
                fn = lambda q, k, v: fa.tome_flash_attention(q, k, v, None, scale)  # noqa: E731
            elif name == "blk784":
                os.environ.pop("VTM_DENSE_BLK", None)
            p8 = time_var(f"{name}_b8_rep{rep}", B8, fn, 150)
            p32 = time_var(f"{name}_b32_rep{rep}", B32, fn, 40)
            record(f"{name}_ratio_rep{rep}", {"b32_per_clip_vs_b8": round(p32 / p8, 4)})
            os.environ.pop("VTM_DENSE_BLK", None)


if __name__ == "__main__":
    main()
