#!/usr/bin/env python3
"""In-context A/B: production attention vs the n8 (sublane-aligned)
kernel, embedded in a realistic ViT block slice (qkv dense -> head
split -> attention -> head merge -> proj dense) so XLA fusion of the
pad/scale glue is part of the measurement.

Round-4 findings feeding this:
  * _forward pads N to a multiple of 128 (1568 -> 1664): 3 pad passes
    + 13% extra matmul FLOPs + unpad slice. The n dim only needs
    sublane (/8) alignment — d=64 is the lane dim. N=1568 divides into
    2x784 chunks with ZERO padding.
  * the outer q*sm_scale elementwise pass costs ~0.13 ms standalone;
    in-kernel scaling is free.
Standalone, the clean kernel is ~35% faster (PROFILE_DECOMP*.json);
this probe decides whether that survives XLA fusion in-model.

Writes PROFILE_BLOCK_ATTN.json. All work fetched before exit.
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
DIM = H * D


def _interp():
    return jax.default_backend() not in ("tpu", "axon")


def _divisor_near(n8, lo, hi, target):
    best = None
    for c in range(lo - lo % 8, hi + 1, 8):
        if c >= lo and n8 % c == 0 and (best is None or abs(c - target) < abs(best - target)):
            best = c
    return best


def n8_attention(q, k, v, sm_scale):
    """Sublane-aligned unbiased kernel: pad n to /8 only, choose exact
    divisor blocks, scale q in-kernel, mask pad keys with an iota on
    the last chunk."""
    b, h, n, d = q.shape
    n8 = -(-n // 8) * 8
    if n8 >= 1152:
        blk = _divisor_near(n8, 384, 1056, 784)
        assert blk is not None, n8
    else:
        blk = n8
    n_chunks = n8 // blk
    dtype = q.dtype

    qs = q.reshape(b * h, n, d)
    ks = k.reshape(b * h, n, d)
    vs = v.reshape(b * h, n, d)
    if n8 != n:
        pad = [(0, 0), (0, n8 - n), (0, 0)]
        qs, ks, vs = (jnp.pad(z, pad) for z in (qs, ks, vs))

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qq = q_ref[0] * sm_scale
        m = jnp.full((qq.shape[0], 1), -1e30, jnp.float32)
        l = jnp.zeros((qq.shape[0], 1), jnp.float32)
        acc = jnp.zeros((qq.shape[0], d), jnp.float32)
        for j in range(n_chunks):
            kj = k_ref[0, j * blk : (j + 1) * blk, :]
            vj = v_ref[0, j * blk : (j + 1) * blk, :]
            s = jax.lax.dot_general(
                qq, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if n8 != n and j == n_chunks - 1:
                lim = n - j * blk
                s = s + jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) >= lim,
                    -1e30,
                    0.0,
                )
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

    out = pl.pallas_call(
        kernel,
        grid=(b * h, n_chunks),
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n8, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n8, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n8, d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n8 * n8 * d,
            bytes_accessed=(4 * b * h * n8 * d) * 2,
            transcendentals=b * h * n8 * n8,
        ),
        interpret=_interp(),
    )(qs, ks, vs)
    return out[:, :n, :].reshape(b, h, n, d)


def block_slice(params, x, which):
    """qkv dense -> split heads -> attention -> merge heads -> proj."""
    b, n, _ = x.shape
    qkv = x @ params["wqkv"] + params["bqkv"]  # [B, N, 3*DIM]
    qkv = qkv.reshape(b, n, 3, H, D)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # [3, B, H, N, D]
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = 1.0 / np.sqrt(D)
    if which == "prod":
        o = fa.tome_flash_attention(q, k, v, None, scale)
    else:
        o = n8_attention(q, k, v, scale)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, DIM)
    return o @ params["wproj"] + params["bproj"]


def main():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    path = REPO / "PROFILE_BLOCK_ATTN.json"

    def record(key, ms):
        out["rows"][key] = {"ms": round(ms, 4)}
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: round(ms, 4)}), flush=True)

    rng = np.random.default_rng(0)
    params = {
        "wqkv": jnp.asarray(rng.standard_normal((DIM, 3 * DIM)) * 0.02, jnp.bfloat16),
        "bqkv": jnp.zeros((3 * DIM,), jnp.bfloat16),
        "wproj": jnp.asarray(rng.standard_normal((DIM, DIM)) * 0.02, jnp.bfloat16),
        "bproj": jnp.zeros((DIM,), jnp.bfloat16),
    }

    for n in (1568, 1418, 968):
        x = jnp.asarray(rng.standard_normal((B, n, DIM)), jnp.bfloat16)
        # parity first
        ref = np.asarray(block_slice(params, x, "prod"), np.float32)
        got = np.asarray(block_slice(params, x, "n8"), np.float32)
        err = float(np.abs(ref - got).max())
        for which in ("prod", "n8"):
            secs = chained_seconds(
                lambda p, v: block_slice(p, v, which), x, 150, rtt=rtt,
                params=params,
            )
            record(f"{which}_block_n{n}", secs / 150 * 1e3)
        record(f"n8_maxerr_n{n}", err)

    # standalone too (same run, for the fusion-effect comparison)
    for n in (1568, 1418):
        q = jnp.asarray(rng.standard_normal((B, H, n, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, n, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, n, D)), jnp.bfloat16)
        scale = 1.0 / np.sqrt(D)
        for which, fn in (
            ("prod", lambda a, b_, c: fa.tome_flash_attention(a, b_, c, None, scale)),
            ("n8", lambda a, b_, c: n8_attention(a, b_, c, scale)),
        ):
            secs = chained_seconds(lambda a: fn(*a), (q, k, v), 150, rtt=rtt)
            record(f"{which}_alone_n{n}", secs / 150 * 1e3)


if __name__ == "__main__":
    main()
