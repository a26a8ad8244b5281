#!/usr/bin/env python3
"""On-chip A/B of dense fused-attention kernel variants that shift
softmax VPU work onto the MXU (round-4 headline lever).

Hypothesis (PERF_NOTES round 3): the dense kernel is VPU-bound — the
qk/pv matmuls at d=64 cost ~0.45 ms each per layer-0 call while the
softmax chain (bias-add, rowmax, exp, rowsum, corrections) is a
comparable amount of VPU time that only partly overlaps. Variants:

  prod       production kernel (chunked online softmax at N>=1536)
  v2_sum     ones-column in v: the softmax denominator comes out of the
             PV matmul (output width 64->65 is free on the MXU), the
             VPU rowsum pass disappears
  v2_fold    v2_sum + bias/pad-mask folded into the QK matmul as two
             extra contraction features (hi/lo bf16 split of the fp32
             bias; contraction 64->66 is free if d=64 half-fills the
             MXU) — the VPU bias-add pass disappears too
  v2_nomax   v2_fold without max subtraction (UNSAFE — measurement
             only: quantifies the remaining rowmax pass)

Plus MXU ground-truth probes: einsum rates at contraction 64 vs 128
and output width 64 vs 128 (is a d=64 matmul charged as d=128?).

Writes PROFILE_DENSE_V2.json. All dispatched work is fetched before
exit (lease safety).
"""

from __future__ import annotations

import functools
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

_LANE = 128


# --------------------------------------------------------------- variants


def _make_v2_kernel(n_pad: int, blk_k: int, d: int, variant: str):
    n_chunks = n_pad // blk_k

    def kernel(q_ref, k_ref, v_ref, hi_ref, lo_ref, o_ref):
        q = q_ref[0]  # [blk_q, d] pre-scaled bf16
        blk_q = q.shape[0]
        if variant != "v2_sum":
            q_aug = jnp.concatenate(
                [q, jnp.ones((blk_q, 2), q.dtype)], axis=-1
            )  # [blk_q, d+2]
        m = jnp.full((blk_q, 1), -1e30, jnp.float32)
        acc = jnp.zeros((blk_q, d + 1), jnp.float32)
        for j in range(n_chunks):
            sl = pl.ds(j * blk_k, blk_k)
            kj = k_ref[0, sl, :]  # [blk_k, d]
            if variant == "v2_sum":
                s = jax.lax.dot_general(
                    q, kj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = s + hi_ref[0, 0, sl][None, :].astype(jnp.float32)
            else:
                k_aug = jnp.concatenate(
                    [kj, hi_ref[0, sl, :], lo_ref[0, sl, :]], axis=-1
                )  # [blk_k, d+2]
                s = jax.lax.dot_general(
                    q_aug, k_aug, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            v_aug = jnp.concatenate(
                [v_ref[0, sl, :], jnp.ones((blk_k, 1), v_ref.dtype)], axis=-1
            )  # [blk_k, d+1]
            if variant == "v2_nomax":
                p = jnp.exp(s)
                acc = acc + jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_aug, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                mj = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - mj)
                corr = jnp.exp(m - mj)
                acc = acc * corr + jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_aug, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = mj
        o_ref[0] = (acc[:, :d] / acc[:, d : d + 1]).astype(o_ref.dtype)

    return kernel


def v2_attention(q, k, v, key_bias, sm_scale, variant: str, blk: int = 800):
    """q/k/v [B, H, N, d]; key_bias [B, N] fp32 or None."""
    b, h, n, d = q.shape
    n_pad = -(-n // _LANE) * _LANE
    blk_k = blk
    while n_pad % blk_k:
        blk_k -= 8
    blk_q = blk_k
    dtype = q.dtype

    qs = (q * sm_scale).reshape(b * h, n, d)
    ks = k.reshape(b * h, n, d)
    vs = v.reshape(b * h, n, d)
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        qs, ks, vs = (jnp.pad(z, pad) for z in (qs, ks, vs))

    bias = jnp.zeros((b, n_pad), jnp.float32)
    if key_bias is not None:
        bias = bias.at[:, :n].set(key_bias.astype(jnp.float32))
    if n_pad != n:
        bias = bias.at[:, n:].set(-1e30)
    hi = bias.astype(jnp.bfloat16)
    lo = (bias - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if variant == "v2_sum":
        # bias added on the VPU in fp32; hi carries the fp32 row instead
        hi_arr = bias[:, None, :]  # [B, 1, n_pad] fp32
        hi_spec = pl.BlockSpec(
            (1, 1, n_pad), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM
        )
        lo_arr = lo[:, :, None]  # unused
        lo_spec = pl.BlockSpec(
            (1, n_pad, 1), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        hi_arr = hi.astype(dtype)[:, :, None]  # [B, n_pad, 1]
        lo_arr = lo.astype(dtype)[:, :, None]
        hi_spec = pl.BlockSpec(
            (1, n_pad, 1), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM
        )
        lo_spec = lo_spec = pl.BlockSpec(
            (1, n_pad, 1), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM
        )

    grid = (b * h, n_pad // blk_q)
    out = pl.pallas_call(
        _make_v2_kernel(n_pad, blk_k, d, variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            hi_spec,
            lo_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n_pad * n_pad * d,
            bytes_accessed=(3 * b * h * n_pad * d + b * h * n_pad * d) * 2,
            transcendentals=b * h * n_pad * n_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, hi_arr, lo_arr)
    return out[:, :n, :].reshape(b, h, n, d)


# ------------------------------------------------------------------ timing


def time_ms(fn, *args, iters=30, rtt=None):
    secs = chained_seconds(lambda a: fn(*a), args, iters, rtt=rtt)
    return secs / iters * 1e3


def main():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    path = REPO / "PROFILE_DENSE_V2.json"

    def record(key, val):
        out["rows"][key] = val
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: val}), flush=True)

    # ---- MXU ground truth: contraction width and output width --------
    rng = np.random.default_rng(0)
    M = 4096
    for dd in (64, 128):
        a = jnp.asarray(rng.standard_normal((M, dd)), jnp.bfloat16)
        bmat = jnp.asarray(rng.standard_normal((dd, M)), jnp.bfloat16)
        ms = time_ms(
            lambda a_, b_: jax.lax.dot_general(
                a_, b_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16),
            a, bmat, iters=3000, rtt=rtt,
        )
        record(f"einsum_contract{dd}", {
            "ms": round(ms, 4),
            "tflops": round(2 * M * M * dd / (ms / 1e3) / 1e12, 1),
        })
    for w in (64, 128):
        a = jnp.asarray(rng.standard_normal((M, M)), jnp.bfloat16)
        bmat = jnp.asarray(rng.standard_normal((M, w)), jnp.bfloat16)
        ms = time_ms(
            lambda a_, b_: jax.lax.dot_general(
                a_, b_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16),
            a, bmat, iters=1500, rtt=rtt,
        )
        record(f"einsum_outwidth{w}", {
            "ms": round(ms, 4),
            "tflops": round(2 * M * M * w / (ms / 1e3) / 1e12, 1),
        })

    # ---- kernel A/B at production shapes -----------------------------
    B, H, D = 8, 12, 64
    scale = 1.0 / np.sqrt(D)
    shapes = [(8, 1568), (8, 1268), (8, 968), (8, 668), (32, 1568)]
    for biased in (False, True):
        for b, n in shapes:
            if biased and (b, n) != (8, 1568):
                continue
            q = jnp.asarray(rng.standard_normal((b, H, n, D)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((b, H, n, D)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, H, n, D)), jnp.bfloat16)
            kb = (
                jnp.asarray(
                    np.log(rng.uniform(1, 12, (b, n))), jnp.float32
                )
                if biased
                else None
            )
            gflop = 2 * 2 * b * H * n * n * D / 1e9
            ref = np.asarray(
                fa._reference(q, k, v, kb, scale), np.float32
            )
            tag = f"b{b}_n{n}" + ("_biased" if biased else "")

            ms = time_ms(
                lambda q_, k_, v_: fa.tome_flash_attention(q_, k_, v_, kb, scale),
                q, k, v, iters=(40 if b > 8 else 150), rtt=rtt,
            )
            record(f"prod_{tag}", {
                "ms": round(ms, 4),
                "tflops": round(gflop / ms, 1),
            })

            for variant in ("v2_sum", "v2_fold", "v2_nomax"):
                try:
                    got = np.asarray(
                        v2_attention(q, k, v, kb, scale, variant), np.float32
                    )
                    err = float(
                        np.abs(got - ref).max()
                        / max(np.abs(ref).max(), 1e-6)
                    )
                    ms = time_ms(
                        lambda q_, k_, v_: v2_attention(
                            q_, k_, v_, kb, scale, variant
                        ),
                        q, k, v, iters=(40 if b > 8 else 150), rtt=rtt,
                    )
                    record(f"{variant}_{tag}", {
                        "ms": round(ms, 4),
                        "tflops": round(gflop / ms, 1),
                        "rel_err_vs_fp32ref": round(err, 6),
                    })
                except Exception as e:
                    record(f"{variant}_{tag}", {
                        "error": f"{type(e).__name__}: {str(e)[:300]}"
                    })


if __name__ == "__main__":
    main()
