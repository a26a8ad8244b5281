#!/usr/bin/env python3
"""Per-stage time breakdown of TimeSformer divided attention on TPU.

TimeSformer sits at 84% of FLOP-ideal (BENCH_FAMILIES.json) with
28-34% MFU. Suspects: the temporal attention runs 18,816 tiny
[8x64x8] batched matmuls ([(B*P)=1568, T=8] sequences), and the
(p t)<->(t p) fold transposes. This times each stage standalone plus a
block-diagonal MXU-packed variant of the tiny-N temporal attention.

CAVEAT: stages ending in pure layout ops get simplified against the
timer's .sum() accumulator — trust matmul/softmax-terminated stages and
the whole-module rows. Writes PROFILE_TIMESFORMER.json.
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

from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def main():
    from bench import _probe_device, nominal_or_probe_peak

    _probe_device()

    b, t, p = 8, 8, 196
    n = p * t + 1
    d, h = 768, 12
    hd = d // h
    scale = hd ** -0.5
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, dt)

    rtt = host_roundtrip_latency()
    m = jnp.ones((4096, 4096), jnp.bfloat16)
    peak = 2 * 4096 ** 3 * 50 / chained_seconds(lambda v: v @ v, m, 50, rtt=rtt) / 1e12
    peak = nominal_or_probe_peak(str(jax.devices()[0]), peak)

    results = {}

    def timeit(name, fn, x, flops=None, params=None, reps=20):
        sec = chained_seconds(fn, x, reps, rtt=rtt, params=params)
        ms = sec / reps * 1e3
        row = {"ms": round(ms, 4)}
        if flops:
            row["eff_tflops"] = round(flops / (sec / reps) / 1e12, 1)
            row["mfu"] = round(flops / (sec / reps) / 1e12 / peak, 4)
        results[name] = row
        print(json.dumps({name: row}), flush=True)
        return ms

    from vtm.models.common import attention_core

    # ---- temporal attention core at [(B*P), T] — the tiny-N suspect
    g = b * p  # 1568 groups
    qt = arr(g, h, t, hd)
    kt = arr(g, h, t, hd)
    vt = arr(g, h, t, hd)
    t_flops = 2 * 2 * g * h * t * t * hd

    timeit(
        "temporal_core_einsum",
        lambda pr, q: attention_core(q, pr[0], pr[1], scale, None),
        qt, flops=t_flops, params=(kt, vt), reps=100,
    )

    # block-diag MXU packing: fold G2 groups into one [G2*T, G2*T] tile
    for g2 in (8, 16):
        gt = g2 * t  # packed sequence

        def packed(pr, q, g2=g2, gt=gt):
            kk, vv = pr
            qf = q.reshape(g // g2, g2, h, t, hd).transpose(0, 2, 1, 3, 4).reshape(g // g2, h, gt, hd)
            kf = kk.reshape(g // g2, g2, h, t, hd).transpose(0, 2, 1, 3, 4).reshape(g // g2, h, gt, hd)
            vf = vv.reshape(g // g2, g2, h, t, hd).transpose(0, 2, 1, 3, 4).reshape(g // g2, h, gt, hd)
            lg = jnp.einsum("bhqd,bhkd->bhqk", qf * scale, kf, preferred_element_type=jnp.float32)
            mask = jnp.kron(jnp.eye(g2, dtype=jnp.float32), jnp.ones((t, t), jnp.float32))
            lg = jnp.where(mask[None, None], lg, -1e30)
            at = jax.nn.softmax(lg, axis=-1).astype(dt)
            out = jnp.einsum("bhqk,bhkd->bhqd", at, vf)
            return out.reshape(g // g2, h, g2, t, hd).transpose(0, 2, 1, 3, 4).reshape(g, h, t, hd)

        timeit(f"temporal_core_packed{g2}", packed, qt, flops=t_flops, params=(kt, vt), reps=100)

    # ---- whole temporal attention module ([(B*P), T, D])
    from vtm.models.timesformer import TimeSformerAttention, TimeSformerBlock, TimeSformerConfig, TimeSformer
    from vtm.merge.policy import MergePolicy, MergeState

    xt = arr(g, t, d)
    tmod = TimeSformerAttention(d, h, True, dtype=dt, with_metric=False)
    tp = tmod.init(jax.random.key(0), xt[:2])["params"]
    timeit(
        "temporal_attn_module",
        lambda pr, x_: tmod.apply({"params": pr}, x_),
        xt, params=tp, reps=50,
    )

    # ---- spatial attention module ([(B*T), P+1, D]), biased + unbiased
    xs = arr(b * t, p + 1, d)
    smod = TimeSformerAttention(d, h, True, dtype=dt, with_metric=True)
    sp = smod.init(jax.random.key(0), xs[:2])["params"]
    size = jnp.ones((b * t, p, 1), jnp.float32)
    timeit(
        "spatial_attn_unbiased",
        lambda pr, x_: smod.apply({"params": pr}, x_)[0],
        xs, params=sp, reps=50,
    )
    timeit(
        "spatial_attn_biased",
        lambda pr, x_: smod.apply({"params": pr}, x_, size)[0],
        xs, params=sp, reps=50,
    )

    # ---- whole block / model (baseline r=0)
    config = TimeSformerConfig()
    x = arr(b, n, d)
    blk = TimeSformerBlock(config, MergePolicy(rs=(0,) * 12, mode="none"), dtype=dt)
    bp = blk.init(jax.random.key(0), x[:1], MergeState(), 0, 1, t)["params"]
    timeit(
        "whole_block",
        lambda pr, x_: blk.apply({"params": pr}, x_, MergeState(), 0, b, t)[0],
        x, params=bp,
    )

    video = jnp.asarray(rng.standard_normal((b, t, 224, 224, 3)), jnp.float32)
    model = TimeSformer(config=config, policy=MergePolicy(rs=(0,) * 12, mode="none"), dtype=dt)
    mp = model.init(jax.random.key(0), video[:1])["params"]
    timeit(
        "whole_model",
        lambda pr, v_: model.apply({"params": pr}, v_)[0],
        video, params=mp,
    )

    out = dict(
        device=str(jax.devices()[0]),
        batch=b, n=n, frames=t,
        peak_bf16_tflops=round(peak, 1),
        stages=results,
    )
    (REPO / "PROFILE_TIMESFORMER.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "stages"}))


if __name__ == "__main__":
    main()
