"""Fused attention kernel for the ToMe video transformers (Pallas/TPU).

Why not XLA einsum or the stock flash kernel:
  * the unfused path materialises [B, H, N, N] logits (fp32: ~1 GB per
    ViT-B layer at N=1568) — HBM-bound at ~20 eff-TFLOP/s;
  * the stock `pallas.ops.tpu.flash_attention` takes a FULL [B,H,N,N]
    bias tensor for proportional attention (same problem), and folding
    the bias into an extra head-dim feature pads d 64->128 on the MXU
    (2x the qk/pv FLOPs).

This kernel: per (batch*head, q-block) program, the whole K/V for the
row lives in VMEM (N<=4096 fits comfortably), logits exist only as a
[blk_q, N] fp32 VMEM tile, and the per-key proportional-attention bias
log(size) is a [N] vector added to the tile — the reference semantics
of `attn += size.log()[..., None, :]` (tome/patch/vivit.py:103-104)
with zero HBM bias traffic.

Forward-only fused; the backward pass falls back to the einsum
formulation via custom_vjp (inference is the hot path; training
recomputes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One (bh, q-block) program: softmax(q K^T * scale + bias) V."""
    q = q_ref[0]  # [blk_q, d] (pre-scaled)
    k = k_ref[0]  # [n_pad, d]
    v = v_ref[0]  # [n_pad, d]
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk_q, n_pad] — only ever a VMEM tile
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p,
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _forward(q, k, v, key_bias, sm_scale, blk_q):
    b, h, n, d = q.shape
    # pad N to the lane width; blk_q shrinks to keep the divisibility
    # (padding waste is quadratic in n_pad/n, so prefer small padding)
    n_pad = -(-n // _LANE) * _LANE
    blk_q = min(blk_q, n_pad)
    while n_pad % blk_q:
        blk_q //= 2
    dtype = q.dtype

    qs = (q * sm_scale).reshape(b * h, n, d)
    ks = k.reshape(b * h, n, d)
    vs = v.reshape(b * h, n, d)
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        qs, ks, vs = (jnp.pad(z, pad) for z in (qs, ks, vs))

    # per-key bias: log(size) (or 0) + -inf on padded keys; per batch
    bias = jnp.zeros((b, 1, n_pad), jnp.float32)
    if key_bias is not None:
        bias = bias.at[:, 0, :n].set(key_bias.astype(jnp.float32))
    if n_pad != n:
        bias = bias.at[:, :, n:].set(-1e30)

    grid = (b * h, n_pad // blk_q)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM),
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
        # non-TPU backends (tests) run the kernel interpreted
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias)
    return out[:, :n, :].reshape(b, h, n, d)


def _reference(q, k, v, key_bias, sm_scale):
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * sm_scale, k, preferred_element_type=jnp.float32
    )
    if key_bias is not None:
        logits = logits + key_bias.astype(jnp.float32)[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def tome_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: Optional[jax.Array] = None,
    sm_scale: float = 1.0,
    blk_q: int = 512,
):
    """softmax(q k^T * sm_scale + key_bias[None,None,:,]) v, fused.

    q/k/v: [B, H, N, d]; key_bias: [B, N] (log token sizes) or None.
    """
    return _forward(q, k, v, key_bias, sm_scale, blk_q)


def _fwd(q, k, v, key_bias, sm_scale, blk_q):
    return _forward(q, k, v, key_bias, sm_scale, blk_q), (q, k, v, key_bias)


def _bwd(sm_scale, blk_q, res, g):
    q, k, v, key_bias = res
    # recompute through the einsum formulation (training path only)
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: _reference(q_, k_, v_, b_, sm_scale), q, k, v, key_bias)
    return vjp(g)


tome_flash_attention.defvjp(_fwd, _bwd)
