#!/usr/bin/env python3
"""DCE-proof decomposition of the dense fused attention kernel's time
at the production layer-0 shape (B8 H12 N1568 d64 bf16).

The earlier qk-only probes were invalid: consuming s[:, :64] lets
Mosaic narrow the matmul's output columns. These probes consume every
output column through a rowsum (one extra VPU pass, identical across
variants being compared):

  qk_d64        s = q @ k_chunk^T (d=64 contraction); acc += rowsum(s)
  qk_packed     interleaved-blockdiag q [2blk,128] @ [k1|k2]^T
                (contraction 128, 2x issued FLOPs); acc += rowsum(s)
  chain_nosmax  s = qk; acc += bf16(s) @ v  (both matmuls, no softmax)
  chain_linear  full prod-shaped chain with exp replaced by identity
                (all VPU passes except transcendentals)
  prod          production kernel (within-run baseline)

Writes PROFILE_DECOMP.json. All dispatched work fetched before exit.
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vtm.ops import flash_attention as fa  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402

B, H, D = 8, 12, 64
N = 1568
N_PAD = 1600
BLK = 800


def _interp():
    return jax.default_backend() not in ("tpu", "axon")


def qk_d64(q, k):
    bh = q.shape[0]

    def kernel(q_ref, k_ref, o_ref):
        qq = q_ref[0]
        acc = jnp.zeros((qq.shape[0], 1), jnp.float32)
        for j in range(N_PAD // BLK):
            kj = k_ref[0, j * BLK : (j + 1) * BLK, :]
            s = jax.lax.dot_general(
                qq, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jnp.sum(s, axis=-1, keepdims=True)
        o_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid=(bh, N_PAD // BLK),
        in_specs=[
            pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK, 1), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, N_PAD, 1), jnp.float32),
        interpret=_interp(),
    )(q, k)


def qk_packed(qp, kc):
    bh2 = qp.shape[0]

    def kernel(q_ref, k_ref, o_ref):
        qq = q_ref[0]  # [2*BLK, 128]
        acc = jnp.zeros((qq.shape[0], 1), jnp.float32)
        for j in range(N_PAD // BLK):
            kj = k_ref[0, j * BLK : (j + 1) * BLK, :]
            s = jax.lax.dot_general(
                qq, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jnp.sum(s, axis=-1, keepdims=True)
        o_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid=(bh2, N_PAD // BLK),
        in_specs=[
            pl.BlockSpec((1, 2 * BLK, 2 * D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_PAD, 2 * D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * BLK, 1), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh2, 2 * N_PAD, 1), jnp.float32),
        interpret=_interp(),
    )(qp, kc)


def chain(q, k, v, mode):
    """mode: 'nosmax' (qk -> cast -> pv), 'linear' (softmax shape with
    identity instead of exp), 'full' (real online softmax)."""
    bh = q.shape[0]

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qq = q_ref[0]
        m = jnp.full((qq.shape[0], 1), -1e30, jnp.float32)
        l = jnp.zeros((qq.shape[0], 1), jnp.float32)
        acc = jnp.zeros((qq.shape[0], D), jnp.float32)
        for j in range(N_PAD // BLK):
            kj = k_ref[0, j * BLK : (j + 1) * BLK, :]
            vj = v_ref[0, j * BLK : (j + 1) * BLK, :]
            s = jax.lax.dot_general(
                qq, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode == "nosmax":
                acc = acc + jax.lax.dot_general(
                    s.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                mj = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = (s - mj) if mode == "linear" else jnp.exp(s - mj)
                corr = (m - mj) if mode == "linear" else jnp.exp(m - mj)
                l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * corr + jax.lax.dot_general(
                    p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = mj
        o_ref[0] = (acc / jnp.maximum(jnp.abs(l), 1e-6)).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(bh, N_PAD // BLK),
        in_specs=[
            pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, N_PAD, D), q.dtype),
        interpret=_interp(),
    )(q, k, v)


def time_ms(fn, args, iters, rtt):
    secs = chained_seconds(lambda a: fn(*a), args, iters, rtt=rtt)
    return secs / iters * 1e3


def main():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "shape": f"B{B} H{H} N{N} d{D} bf16", "rows": {}}
    path = REPO / "PROFILE_DECOMP.json"

    def record(key, ms, note=""):
        row = {"ms": round(ms, 4)}
        if note:
            row["note"] = note
        out["rows"][key] = row
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: row}), flush=True)

    rng = np.random.default_rng(0)
    bh = B * H
    q = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)

    # qk matmul-rate probes (rowsum consume; identical VPU overhead)
    record("qk_d64", time_ms(qk_d64, (q, k), 200, rtt),
           "useful qk GFLOP=%.1f" % (2 * bh * N_PAD * N_PAD * D / 1e9))
    q4 = np.asarray(q, np.float32).reshape(bh // 2, 2, N_PAD, D)
    qp = np.zeros((bh // 2, 2 * N_PAD, 2 * D), np.float32)
    qp[:, 0::2, :D] = q4[:, 0]
    qp[:, 1::2, D:] = q4[:, 1]
    k4 = np.asarray(k, np.float32).reshape(bh // 2, 2, N_PAD, D)
    kc = np.concatenate([k4[:, 0], k4[:, 1]], axis=-1)
    record("qk_packed", time_ms(qk_packed, (jnp.asarray(qp, jnp.bfloat16), jnp.asarray(kc, jnp.bfloat16)), 200, rtt),
           "2x issued FLOPs at contraction 128")

    # chain decomposition
    record("chain_nosmax", time_ms(lambda a, b_, c: chain(a, b_, c, "nosmax"), (q, k, v), 150, rtt),
           "qk + cast + pv, no softmax")
    record("chain_linear", time_ms(lambda a, b_, c: chain(a, b_, c, "linear"), (q, k, v), 150, rtt),
           "all softmax passes, identity instead of exp")
    record("chain_full", time_ms(lambda a, b_, c: chain(a, b_, c, "full"), (q, k, v), 150, rtt),
           "real online softmax (prod-equivalent math)")

    qb = q.reshape(B, H, N_PAD, D)
    kb_ = k.reshape(B, H, N_PAD, D)
    vb = v.reshape(B, H, N_PAD, D)
    record("prod", time_ms(
        lambda a, b_, c: fa.tome_flash_attention(a, b_, c, None, 1.0), (qb, kb_, vb), 150, rtt))


if __name__ == "__main__" and "--bias" not in sys.argv and "--cost" not in sys.argv:
    main()


def chain_bias(q, k, v, bias, mode):
    """chain_full + per-chunk bias add: '1d' = prod's 1-D slice +
    [None, :] broadcast; '2d' = 2-D [1, blk] slice broadcast."""
    bh = q.shape[0]

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        qq = q_ref[0]
        m = jnp.full((qq.shape[0], 1), -1e30, jnp.float32)
        l = jnp.zeros((qq.shape[0], 1), jnp.float32)
        acc = jnp.zeros((qq.shape[0], D), jnp.float32)
        for j in range(N_PAD // BLK):
            kj = k_ref[0, j * BLK : (j + 1) * BLK, :]
            vj = v_ref[0, j * BLK : (j + 1) * BLK, :]
            s = jax.lax.dot_general(
                qq, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode == "1d":
                s = s + bias_ref[0, 0, j * BLK : (j + 1) * BLK][None, :]
            else:
                s = s + bias_ref[0, :, j * BLK : (j + 1) * BLK]
            mj = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - mj)
            corr = jnp.exp(m - mj)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = mj
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(bh, N_PAD // BLK),
        in_specs=[
            pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N_PAD), lambda b_, qi: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, N_PAD, D), q.dtype),
        interpret=_interp(),
    )(q, k, v, bias)


def main2():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    path = REPO / "PROFILE_DECOMP2.json"

    def record(key, ms):
        out["rows"][key] = {"ms": round(ms, 4)}
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: round(ms, 4)}), flush=True)

    rng = np.random.default_rng(0)
    bh = B * H
    q = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)
    bias = jnp.zeros((1, 1, N_PAD), jnp.float32)

    record("chain_full", time_ms(lambda a, b_, c: chain(a, b_, c, "full"), (q, k, v), 150, rtt))
    record("chain_full_bias1d", time_ms(lambda a, b_, c: chain_bias(a, b_, c, bias, "1d"), (q, k, v), 150, rtt))
    record("chain_full_bias2d", time_ms(lambda a, b_, c: chain_bias(a, b_, c, bias, "2d"), (q, k, v), 150, rtt))
    qb = q.reshape(B, H, N_PAD, D)
    kb_ = k.reshape(B, H, N_PAD, D)
    vb = v.reshape(B, H, N_PAD, D)
    record("prod", time_ms(
        lambda a, b_, c: fa.tome_flash_attention(a, b_, c, None, 1.0), (qb, kb_, vb), 150, rtt))
    record("prod_scaled", time_ms(
        lambda a, b_, c: fa.tome_flash_attention(a, b_, c, None, 0.125), (qb, kb_, vb), 150, rtt))


if __name__ == "__main__" and "--bias" in sys.argv and "--cost" not in sys.argv:
    main2()


def main3():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    path = REPO / "PROFILE_DECOMP3.json"

    def record(key, ms):
        out["rows"][key] = {"ms": round(ms, 4)}
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: round(ms, 4)}), flush=True)

    rng = np.random.default_rng(0)
    bh = B * H
    q = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, N_PAD, D)), jnp.bfloat16)
    bias = jnp.zeros((1, 1, N_PAD), jnp.float32)

    # with the production cost_estimate attached
    import functools as ft

    def chain_bias_cost(q_, k_, v_, bias_):
        bh_ = q_.shape[0]
        kernel_call = pl.pallas_call(
            _chain_bias_kernel,
            grid=(bh_, N_PAD // BLK),
            in_specs=[
                pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, N_PAD), lambda b_, qi: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh_, N_PAD, D), q_.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * B * H * N_PAD * N_PAD * D,
                bytes_accessed=(3 * B * H * N_PAD * D + B * H * N_PAD * D) * 2,
                transcendentals=B * H * N_PAD * N_PAD,
            ),
            interpret=_interp(),
        )
        return kernel_call(q_, k_, v_, bias_)

    def _chain_bias_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        qq = q_ref[0]
        m = jnp.full((qq.shape[0], 1), -1e30, jnp.float32)
        l = jnp.zeros((qq.shape[0], 1), jnp.float32)
        acc = jnp.zeros((qq.shape[0], D), jnp.float32)
        for j in range(N_PAD // BLK):
            kj = k_ref[0, j * BLK : (j + 1) * BLK, :]
            vj = v_ref[0, j * BLK : (j + 1) * BLK, :]
            s = jax.lax.dot_general(
                qq, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + bias_ref[0, 0, j * BLK : (j + 1) * BLK][None, :]
            mj = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - mj)
            corr = jnp.exp(m - mj)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = mj
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    record("chain_bias1d", time_ms(lambda a, b_, c: chain_bias(a, b_, c, bias, "1d"), (q, k, v), 150, rtt))
    record("chain_bias1d_cost", time_ms(chain_bias_cost, (q, k, v, bias), 150, rtt))
    qb = q.reshape(B, H, N_PAD, D)
    kb_ = k.reshape(B, H, N_PAD, D)
    vb = v.reshape(B, H, N_PAD, D)
    record("fa_forward_raw", time_ms(
        lambda a, b_, c: fa._forward(a, b_, c, None, 1.0, None), (qb, kb_, vb), 150, rtt))
    record("prod", time_ms(
        lambda a, b_, c: fa.tome_flash_attention(a, b_, c, None, 1.0), (qb, kb_, vb), 150, rtt))


if __name__ == "__main__" and "--cost" in sys.argv:
    main3()
