#!/usr/bin/env python3
"""In-kernel MXU ground truth + head-pair PACKED attention A/B.

Round-4 finding: the dense kernel is MXU-bound at big N and the d=64
contraction appears to run ~53 TF/s in XLA probes (a 3.4x penalty vs
182 at contraction 128 — NOT the assumed 2x "half-fill"). If that holds
in-kernel, packing two heads into ONE contraction-128 matmul via an
interleaved block-diagonal q (2x issued FLOPs at the 128-wide rate)
nets ~1.7x on qk, and a plain [v1|v2] lane-concat does the same for pv
(output 128 wide, half the columns per row wasted).

Probes (PROFILE_MXU_PACK.json):
  qk64        production-style per-head qk chain (rate of d=64 qk)
  qk_packed   interleaved-blockdiag q [2*blk_q, 128] @ [k1|k2]^T,
              operands PREBUILT in HBM (pure matmul rate)
  packed_attn full correct attention, head-pair packed, operands built
              IN-KERNEL, token-major [B, N, H*d] output
  prod        production tome_flash_attention (within-run baseline)

Packed math: q_pack row 2i = [q1_i | 0], row 2i+1 = [0 | q2_i], so
s = q_pack @ [k1|k2]^T gives row 2i = q1_i k1^T, row 2i+1 = q2_i k2^T —
per-row softmax is per-head-correct. pv: p @ [v1|v2] puts head1's
output in lanes 0:64 of even rows and head2's in lanes 64:128 of odd
rows; one end-of-program [2B,128]->[B,256] reshape + lane concat
extracts the [blk_q, 128] head-pair token-major tile.

All dispatched work is fetched before exit (lease safety).
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

_LANE = 128
_INTERP = None


def _interp():
    global _INTERP
    if _INTERP is None:
        _INTERP = jax.default_backend() not in ("tpu", "axon")
    return _INTERP


# ------------------------------------------------------- qk rate probes


def qk64(q, k, blk=800):
    """Per-head qk chain, consume cheaply."""
    bh, n_pad, d = q.shape
    n_chunks = n_pad // blk

    def kernel(q_ref, k_ref, o_ref):
        qq = q_ref[0]
        acc = jnp.zeros((qq.shape[0], d), jnp.float32)
        for j in range(n_chunks):
            kj = k_ref[0, j * blk : (j + 1) * blk, :]
            s = jax.lax.dot_general(
                qq, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + s[:, :d]
        o_ref[0] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(bh, n_pad // blk),
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        interpret=_interp(),
    )(q, k)


def qk_packed(qp, kc, blk=800):
    """qp [bh2, 2*n_pad, 128] prebuilt interleaved blockdiag;
    kc [bh2, n_pad, 128] prebuilt [k1|k2]."""
    bh2, n2, dd = qp.shape
    n_pad = n2 // 2
    n_chunks = n_pad // blk

    def kernel(q_ref, k_ref, o_ref):
        qq = q_ref[0]  # [2*blk, 128]
        acc = jnp.zeros((qq.shape[0], 64), jnp.float32)
        for j in range(n_chunks):
            kj = k_ref[0, j * blk : (j + 1) * blk, :]
            s = jax.lax.dot_general(
                qq, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + s[:, :64]
        o_ref[0] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(bh2, n_pad // blk),
        in_specs=[
            pl.BlockSpec((1, 2 * blk, dd), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, dd), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * blk, 64), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh2, n2, 64), qp.dtype),
        interpret=_interp(),
    )(qp, kc)


# --------------------------------------------------- packed attention


def _make_packed_kernel(n_pad, blk_k, d, biased):
    n_chunks = n_pad // blk_k

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        q1 = q_ref[0, 0]  # [blk_q, d] pre-scaled
        q2 = q_ref[0, 1]
        blk_q = q1.shape[0]
        z = jnp.zeros_like(q1)
        # interleaved blockdiag: [blk_q, 4d] -> [2*blk_q, 2d]
        qp = jnp.concatenate([q1, z, z, q2], axis=-1).reshape(2 * blk_q, 2 * d)
        m = jnp.full((2 * blk_q, 1), -1e30, jnp.float32)
        l = jnp.zeros((2 * blk_q, 1), jnp.float32)
        acc = jnp.zeros((2 * blk_q, 2 * d), jnp.float32)
        for j in range(n_chunks):
            sl = pl.ds(j * blk_k, blk_k)
            kc = jnp.concatenate([k_ref[0, 0, sl, :], k_ref[0, 1, sl, :]], axis=-1)
            s = jax.lax.dot_general(
                qp, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [2*blk_q, blk_k]
            if biased:
                s = s + bias_ref[0, 0, sl][None, :]
            mj = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - mj)
            corr = jnp.exp(m - mj)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            vc = jnp.concatenate([v_ref[0, 0, sl, :], v_ref[0, 1, sl, :]], axis=-1)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = mj
        o_pack = acc / l  # [2*blk_q, 2d]: even rows lanes :d = head1,
        #                     odd rows lanes d: = head2
        o2 = o_pack.reshape(blk_q, 4 * d)
        out = jnp.concatenate([o2[:, :d], o2[:, 3 * d :]], axis=-1)
        o_ref[0, :, 0, 0] = out.astype(o_ref.dtype)

    return kernel


def packed_attention(q, k, v, key_bias, sm_scale, blk: int = 800):
    """q/k/v [B, H, N, d] -> token-major [B, N, H*d]."""
    b, h, n, d = q.shape
    assert h % 2 == 0
    n_pad = -(-n // _LANE) * _LANE
    blk_k = blk
    while n_pad % blk_k:
        blk_k -= 8
    blk_q = blk_k
    dtype = q.dtype

    qs = (q * sm_scale).reshape(b, h // 2, 2, n, d)
    ks = k.reshape(b, h // 2, 2, n, d)
    vs = v.reshape(b, h // 2, 2, n, d)
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        qs, ks, vs = (jnp.pad(z, pad) for z in (qs, ks, vs))
    qs = qs.reshape(b * h // 2, 2, n_pad, d)
    ks = ks.reshape(b * h // 2, 2, n_pad, d)
    vs = vs.reshape(b * h // 2, 2, n_pad, d)

    bias = jnp.zeros((b, 1, n_pad), jnp.float32)
    if key_bias is not None:
        bias = bias.at[:, 0, :n].set(key_bias.astype(jnp.float32))
    if n_pad != n:
        bias = bias.at[:, :, n:].set(-1e30)
    biased = key_bias is not None or n_pad != n
    h2 = h // 2

    grid = (b * h2, n_pad // blk_q)
    out = pl.pallas_call(
        _make_packed_kernel(n_pad, blk_k, d, biased),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, blk_q, d), lambda bh, qi: (bh, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bh, qi: (bh, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bh, qi: (bh, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bh, qi: (bh // h2, 0, 0), memory_space=pltpu.VMEM),
        ],
        # token-major out: [B, nq_pad, h2, 1, 2d] — each program owns a
        # static 128-lane head-pair column block; the trailing
        # (1, 2d) block dims satisfy Mosaic's rule by equality/128
        out_specs=pl.BlockSpec(
            (1, blk_q, 1, 1, 2 * d),
            lambda bh, qi: (bh // h2, qi, bh % h2, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h2, 1, 2 * d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n_pad * n_pad * 2 * d,
            bytes_accessed=(3 * b * h * n_pad * d + b * h * n_pad * d) * 2,
            transcendentals=b * h * n_pad * n_pad,
        ),
        interpret=_interp(),
    )(qs, ks, vs, bias)
    # [B, nq_pad, h2, 1, 2d] -> [B, N, H*d]: a FREE reshape (token-major
    # in HBM already — no epilogue transpose)
    return out.reshape(b, n_pad, h * d)[:, :n, :]


# ------------------------------------------------------------------ main


def time_ms(fn, args, iters, rtt):
    secs = chained_seconds(lambda a: fn(*a), args, iters, rtt=rtt)
    return secs / iters * 1e3


def main():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    path = REPO / "PROFILE_MXU_PACK.json"

    def record(key, val):
        out["rows"][key] = val
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: val}), flush=True)

    rng = np.random.default_rng(0)
    B, H, D = 8, 12, 64
    scale = 1.0 / np.sqrt(D)

    # ---- qk rate probes at the layer-0 shape -------------------------
    n = 1568
    n_pad = 1600
    bh = B * H
    useful_tf = 2 * bh * n_pad * n_pad * D
    q = jnp.asarray(rng.standard_normal((bh, n_pad, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, n_pad, D)), jnp.bfloat16)
    ms = time_ms(qk64, (q, k), 150, rtt)
    record("qk64", {"ms": round(ms, 4), "useful_tflops": round(useful_tf / ms / 1e9, 1)})

    # prebuilt packed operands
    q4 = np.asarray(q, np.float32).reshape(bh // 2, 2, n_pad, D)
    qp = np.zeros((bh // 2, 2 * n_pad, 2 * D), np.float32)
    qp[:, 0::2, :D] = q4[:, 0]
    qp[:, 1::2, D:] = q4[:, 1]
    k4 = np.asarray(k, np.float32).reshape(bh // 2, 2, n_pad, D)
    kc = np.concatenate([k4[:, 0], k4[:, 1]], axis=-1)
    qp = jnp.asarray(qp, jnp.bfloat16)
    kc = jnp.asarray(kc, jnp.bfloat16)
    ms = time_ms(qk_packed, (qp, kc), 150, rtt)
    record("qk_packed_prebuilt", {"ms": round(ms, 4), "useful_tflops": round(useful_tf / ms / 1e9, 1)})

    # ---- packed attention vs prod ------------------------------------
    shapes = [(8, 1568), (8, 1268), (8, 968), (8, 668), (8, 368), (32, 1568)]
    for biased in (False, True):
        for b, nn in shapes:
            if biased and (b, nn) != (8, 1568):
                continue
            q = jnp.asarray(rng.standard_normal((b, H, nn, D)), jnp.bfloat16)
            kk = jnp.asarray(rng.standard_normal((b, H, nn, D)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, H, nn, D)), jnp.bfloat16)
            kb = (
                jnp.asarray(np.log(rng.uniform(1, 12, (b, nn))), jnp.float32)
                if biased
                else None
            )
            gflop = 2 * 2 * b * H * nn * nn * D / 1e9
            tag = f"b{b}_n{nn}" + ("_biased" if biased else "")
            iters = 40 if b > 8 else (150 if nn >= 968 else 400)

            ref = np.asarray(fa._reference(q, kk, v, kb, scale), np.float32)
            ref_tm = np.transpose(ref, (0, 2, 1, 3)).reshape(b, nn, H * D)

            ms = time_ms(
                lambda q_, k_, v_: fa.tome_flash_attention(q_, k_, v_, kb, scale),
                (q, kk, v), iters, rtt,
            )
            record(f"prod_{tag}", {"ms": round(ms, 4), "tflops": round(gflop / ms, 1)})

            try:
                got = np.asarray(packed_attention(q, kk, v, kb, scale), np.float32)
                err = float(np.abs(got - ref_tm).max() / max(np.abs(ref_tm).max(), 1e-6))
                ms = time_ms(
                    lambda q_, k_, v_: packed_attention(q_, k_, v_, kb, scale),
                    (q, kk, v), iters, rtt,
                )
                record(f"packed_{tag}", {
                    "ms": round(ms, 4),
                    "tflops": round(gflop / ms, 1),
                    "rel_err_vs_fp32ref": round(err, 6),
                })
            except Exception as e:
                record(f"packed_{tag}", {"error": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
