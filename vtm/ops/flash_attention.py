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

Padding (round 4): the token dim sits on SUBLANES (d=64 is the lane
dim), so N pads to a multiple of 8, not 128, and blocks are exact
divisors of ceil8(N) — N=1568 runs as 2x784 chunks with ZERO padding.
The old 128-lane padding (1568 -> 1664) cost three whole-tensor pad
passes + 13% extra matmul FLOPs, and the outer q*sm_scale pass another
~0.13 ms — together ~35% of the kernel's standalone wall time
(PROFILE_BLOCK_ATTN.json: 1.48 -> 0.82 ms at B8 H12 N1568). q is now
scaled in-kernel and pad keys are masked by a static iota on the last
chunk (unbiased) / -1e30 bias entries (biased).

Both passes are fused: the backward kernel recomputes the softmax rows
with the same whole-K/V-row scheme and accumulates dk/dv/dbias across
sequential q-block grid steps (their block index is constant along that
dim, so the accumulators stay resident in VMEM) — train-through-merging
(`tome_train_*` configs) never materializes [N, N] logits in HBM in
either direction. The per-frame trajectory kernel has its own fused
backward (``_frame_backward_tm``, per-frame softmax recompute in
[blk_q, s_pad] tiles); the einsum-recompute vjp survives only as the
odd-head / very-long-row fallback in ``_frame_bwd``.
"""

from __future__ import annotations

import functools
import os
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
    # normalize AFTER the PV matmul: the division runs on the [blk_q, d]
    # output instead of the [blk_q, n] tile (d/n ~ 26x fewer elements)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _kernel_chunked(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_pad, blk_k):
    """Online-softmax variant: the key row is processed in blk_k chunks
    so Mosaic's scheduler can overlap chunk j's exp (VPU) with chunk
    j+1's qk matmul (MXU). ~15% faster than the whole-row kernel at
    N=1568 (67 vs 58 TF/s measured); identical math up to fp
    reassociation."""
    q = q_ref[0]  # [blk_q, d] (pre-scaled)
    d = q_ref.shape[-1]
    m = jnp.full((q.shape[0], 1), -1e30, jnp.float32)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], d), jnp.float32)
    for j in range(n_pad // blk_k):
        kj = k_ref[0, j * blk_k : (j + 1) * blk_k, :]
        vj = v_ref[0, j * blk_k : (j + 1) * blk_k, :]
        s = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + bias_ref[0, 0, j * blk_k : (j + 1) * blk_k][None, :]
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


# VMEM budget for the [blk_q, n_pad] fp32 logits tile. Bigger q-blocks
# amortize per-program overhead (measured at N=1568: blk_q 128 -> 1.68
# ms/layer, whole-row 1664 -> 1.29 ms); cap so the tile leaves room for
# q/k/v/out in VMEM.
_LOGITS_TILE_BYTES = 12 * 1024 * 1024


def _pick_blk_q(n_pad: int, requested: Optional[int]) -> int:
    cap = max(_LANE, _LOGITS_TILE_BYTES // (4 * n_pad))
    blk = min(requested or n_pad, n_pad, cap)
    while n_pad % blk or blk % 8:
        blk -= 1
    return blk


def _fwd_pick(n: int, hi: int) -> Optional[Tuple[int, int]]:
    """(n8, blk) for long forward rows (ceil8(n) >= 1152): the smallest
    /8 padding of ``n`` that admits an exact-divisor key chunk in the
    measured square-ish sweet spot (384..832, near 784 — see
    _forward_lanepad's chunk notes). Base-padding-only selection took
    blk=1048 at ViViT's N=3137 (ceil8 = 3144 = 8*3*131 has no other /8
    divisor in the window), whose [1048, 1048] fp32 logits tile fails
    to compile at batch 8 (remote compile-helper exit 1, BENCH_FAMILIES
    round-4 refresh); padding 23 more keys to 3160 gives blk=632 — the
    same regime as the proven N=1568 -> blk=784 config. Falls back to
    the first candidate admitting any in-window chunk (old behavior),
    else None -> the caller's 128-lane-padded path."""
    base = -(-n // 8) * 8
    fallback = None
    for n8 in range(base, -(-n // _LANE) * _LANE + 1, 8):
        blk = _divisor_near(n8, 384, min(832, hi), 784)
        if blk is not None:
            return n8, blk
        if fallback is None and hi > 832:
            blk = _divisor_near(n8, 384, hi, 784)
            if blk is not None:
                fallback = (n8, blk)
    return fallback


def _divisor_near(n8: int, lo: int, hi: int, target: int) -> Optional[int]:
    """Largest-|target-c|-minimizing multiple of 8 in [lo, hi] that
    divides n8 exactly; None if there is none."""
    best = None
    for c in range(lo + (-lo) % 8, hi + 1, 8):
        if n8 % c == 0 and (best is None or abs(c - target) < abs(best - target)):
            best = c
    return best


def _make_n8_kernel(n: int, n8: int, blk: int, d: int, scale: float, biased: bool):
    """One (bh, q-block) program of the sublane-aligned forward.

    The n dim of q/k/v blocks only needs /8 (sublane) alignment — d=64
    is the lane dim — so n pads to a multiple of 8 instead of 128
    (round-3's 128-lane padding inflated N=1568 to 1664: +13% matmul
    FLOPs plus three whole-tensor pad passes and an unpad slice, ~35%
    of the kernel's wall time; PROFILE_BLOCK_ATTN.json). q is scaled
    IN-kernel (the outer q*sm_scale elementwise pass cost ~0.13 ms at
    layer-0 shape). Pad keys are masked with a static iota on the last
    chunk (unbiased) or -1e30 entries in the chunk-blocked bias row
    (biased) — no [N]-lane bias array is ever sliced at non-128
    offsets."""
    n_chunks = n8 // blk

    def kernel(*refs):
        if biased:
            q_ref, k_ref, v_ref, bias_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
        q = q_ref[0] * scale  # [blk_q, d] — scaled on the VPU in-program
        m = jnp.full((q.shape[0], 1), -1e30, jnp.float32)
        l = jnp.zeros((q.shape[0], 1), jnp.float32)
        acc = jnp.zeros((q.shape[0], d), jnp.float32)
        for j in range(n_chunks):
            kj = k_ref[0, j * blk : (j + 1) * blk, :]
            vj = v_ref[0, j * blk : (j + 1) * blk, :]
            s = jax.lax.dot_general(
                q, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [blk_q, blk] fp32 — only ever a VMEM tile
            if biased:
                s = s + bias_ref[0, j : j + 1, :]
            elif n8 != n and j == n_chunks - 1:
                s = s + jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
                    >= n - j * blk,
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

    return kernel


def _forward(q, k, v, key_bias, sm_scale, blk_q):
    """Sublane-aligned (n8) forward; falls back to the 128-lane-padded
    path when no exact-divisor chunk exists for a long row."""
    b, h, n, d = q.shape
    if os.environ.get("VTM_DENSE_N8", "1") == "0":
        # on-chip A/B escape hatch: force the legacy 128-lane-padded path
        return _forward_lanepad(q, k, v, key_bias, sm_scale, blk_q)
    n8 = -(-n // 8) * 8
    env_blk = os.environ.get("VTM_DENSE_BLK")
    if env_blk:
        # on-chip A/B override (tools/ab_b32.py); must divide ceil8(N)
        blk = int(env_blk)
        if n8 % blk or blk % 8:
            raise ValueError(f"VTM_DENSE_BLK={blk} does not divide n8={n8}")
    elif n8 >= 1152:
        hi = min(1056, blk_q) if blk_q else 1056
        pick = _fwd_pick(n, hi)
        if pick is None:
            return _forward_lanepad(q, k, v, key_bias, sm_scale, blk_q)
        n8, blk = pick
    elif blk_q and blk_q < n8:
        blk = _divisor_near(n8, 8, blk_q, blk_q)
        if blk is None:
            return _forward_lanepad(q, k, v, key_bias, sm_scale, blk_q)
    else:
        blk = n8
    dtype = q.dtype

    qs = q.reshape(b * h, n, d)
    ks = k.reshape(b * h, n, d)
    vs = v.reshape(b * h, n, d)
    if n8 != n:
        pad = [(0, 0), (0, n8 - n), (0, 0)]
        qs, ks, vs = (jnp.pad(z, pad) for z in (qs, ks, vs))

    biased = key_bias is not None
    operands = [qs, ks, vs]
    in_specs = [
        pl.BlockSpec((1, blk, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n8, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n8, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
    ]
    if biased:
        # chunk-blocked bias [B, n_chunks, blk]: the kernel reads chunk
        # j as a [1, blk] row — never a lane slice at a non-128 offset
        bias = jnp.full((b, n8), -1e30, jnp.float32)
        bias = bias.at[:, :n].set(key_bias.astype(jnp.float32))
        operands.append(bias.reshape(b, n8 // blk, blk))
        in_specs.append(
            pl.BlockSpec(
                (1, n8 // blk, blk),
                lambda bh, qi: (bh // h, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    out = pl.pallas_call(
        _make_n8_kernel(n, n8, blk, d, sm_scale, biased),
        grid=(b * h, n8 // blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, blk, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n8, d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n8 * n8 * d,
            bytes_accessed=(3 * b * h * n8 * d + b * h * n8 * d) * 2,
            transcendentals=b * h * n8 * n8,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(*operands)
    if n8 != n:
        out = out[:, :n, :]
    return out.reshape(b, h, n, d)


def _forward_lanepad(q, k, v, key_bias, sm_scale, blk_q):
    b, h, n, d = q.shape
    # pad N to the lane width; blk_q defaults to the whole row when the
    # fp32 logits tile fits VMEM, else the largest fitting divisor
    n_pad = -(-n // _LANE) * _LANE
    blk_q = _pick_blk_q(n_pad, blk_q)
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

    # long rows: chunk the keys for MXU/VPU overlap (see _kernel_chunked).
    # Measured sweet spot: square-ish blocks near 700 (N=1568: 832x2
    # chunks 58->67 TF/s; N=3137: 640x5 chunks 64->71 TF/s).
    if n_pad >= 1536 and blk_q >= 512:
        candidates = [
            n_pad // c
            for c in range(2, 9)
            if n_pad % c == 0 and (n_pad // c) % 8 == 0 and n_pad // c >= 384
        ]
        blk_k = (
            min(candidates, key=lambda bk: abs(bk - 704))
            if candidates
            else n_pad // 2
        )
        kernel = functools.partial(_kernel_chunked, n_pad=n_pad, blk_k=blk_k)
        blk_q = _pick_blk_q(n_pad, blk_k)
    else:
        kernel = _kernel

    grid = (b * h, n_pad // blk_q)
    out = pl.pallas_call(
        kernel,
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
    blk_q: Optional[int] = None,
):
    """softmax(q k^T * sm_scale + key_bias[None,None,:,]) v, fused.

    q/k/v: [B, H, N, d]; key_bias: [B, N] (log token sizes) or None.
    blk_q None = auto (whole row when the logits tile fits VMEM).
    """
    return _forward(q, k, v, key_bias, sm_scale, blk_q)


def _fwd(q, k, v, key_bias, sm_scale, blk_q):
    return _forward(q, k, v, key_bias, sm_scale, blk_q), (q, k, v, key_bias)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, db_ref, *, scale):
    """One (bh, q-block) program of the fused backward: recompute the
    softmax row (same whole-K/V-row-in-VMEM scheme as the forward), then
      ds = p * (dp - rowsum(p * dp)),   dp = do v^T
      dq = scale * ds k;  dk += scale * ds^T q;  dv += p^T do;
      dbias += colsum(ds).
    dk/dv/db index maps are constant along the q-block grid dim, so the
    accumulators stay resident in VMEM across sequential q blocks."""
    qi = pl.program_id(1)
    q = q_ref[0]  # [blk_q, d]
    k = k_ref[0]  # [n_pad, d]
    v = v_ref[0]
    do = do_ref[0]  # [blk_q, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # fp32 [blk_q, n_pad]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [blk_q, n_pad]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)  # fp32
    p_lo = p.astype(do.dtype)
    ds_lo = ds.astype(do.dtype)
    dq_ref[0] = (
        jax.lax.dot_general(
            ds_lo, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    ).astype(dq_ref.dtype)
    dk_new = (
        jax.lax.dot_general(
            ds_lo, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [n_pad, d]
    dv_new = jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db_new = jnp.sum(ds, axis=0, keepdims=True)  # [1, n_pad]

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = dk_new
        dv_ref[0] = dv_new
        db_ref[0] = db_new

    @pl.when(qi > 0)
    def _():
        dk_ref[0] += dk_new
        dv_ref[0] += dv_new
        db_ref[0] += db_new


def _bwd_pick(n: int) -> Optional[Tuple[int, int]]:
    """(n8, blk) for the sublane-aligned backward: the smallest /8
    padding of ``n`` that admits an exact-divisor q-block near 256
    (bounded so the four live [blk, n8] fp32 tiles stay under ~9 MB of
    VMEM). N=1568 -> (1568, 224) with ZERO padding; N=1418 -> (1440,
    288) at 1.5% padding vs the old 128-lane 1536 (8.3%). None -> no
    candidate up to ceil128(n); caller falls back to the lane-padded
    path."""
    base = -(-n // 8) * 8
    if base <= _LANE:
        return base, base
    for n8 in range(base, -(-n // _LANE) * _LANE + 1, 8):
        hi = min(512, n8, max(128, 9_000_000 // (16 * n8) // 8 * 8))
        blk = n8 if n8 <= hi else _divisor_near(n8, 128, hi, 256)
        if blk is not None:
            return n8, blk
    return None


def _backward(q, k, v, key_bias, g, sm_scale, blk_q=256):
    """Sublane-aligned (n8) backward; same padding scheme as the
    forward (the token dim sits on sublanes, so /8 alignment suffices
    and pad queries/keys are killed by zero-padded do / -1e30 bias
    entries). Falls back to the 128-lane-padded path when no
    exact-divisor q-block exists."""
    b, h, n, d = q.shape
    pick = _bwd_pick(n)
    if pick is None:
        return _backward_lanepad(q, k, v, key_bias, g, sm_scale, blk_q)
    n_pad, blk_q_eff = pick
    return _backward_impl(q, k, v, key_bias, g, sm_scale, n_pad, blk_q_eff)


def _backward_lanepad(q, k, v, key_bias, g, sm_scale, blk_q=256):
    """Legacy 128-lane-padded backward (fallback only)."""
    n = q.shape[2]
    n_pad = -(-n // _LANE) * _LANE
    blk_q_eff = blk_q
    while n_pad % blk_q_eff:
        blk_q_eff //= 2
    return _backward_impl(q, k, v, key_bias, g, sm_scale, n_pad, blk_q_eff)


def _backward_impl(q, k, v, key_bias, g, sm_scale, n_pad, blk_q_eff):
    b, h, n, d = q.shape
    dtype = q.dtype

    qs = q.reshape(b * h, n, d)
    ks = k.reshape(b * h, n, d)
    vs = v.reshape(b * h, n, d)
    dos = g.reshape(b * h, n, d)
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        qs, ks, vs, dos = (jnp.pad(z, pad) for z in (qs, ks, vs, dos))

    bias = jnp.zeros((b, 1, n_pad), jnp.float32)
    if key_bias is not None:
        bias = bias.at[:, 0, :n].set(key_bias.astype(jnp.float32))
    if n_pad != n:
        bias = bias.at[:, :, n:].set(-1e30)

    grid = (b * h, n_pad // blk_q_eff)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q_eff, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q_eff, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q_eff, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_pad, d), dtype),
            jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 1, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * n_pad * n_pad * d,
            bytes_accessed=(7 * b * h * n_pad * d) * 2,
            transcendentals=b * h * n_pad * n_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias, dos)

    dq = dq[:, :n, :].reshape(b, h, n, d)
    dk = dk[:, :n, :].reshape(b, h, n, d).astype(dtype)
    dv = dv[:, :n, :].reshape(b, h, n, d).astype(dtype)
    if key_bias is None:
        dbias = None
    else:
        dbias = db[:, 0, :n].reshape(b, h, n).sum(axis=1).astype(key_bias.dtype)
    return dq, dk, dv, dbias


def _bwd(sm_scale, blk_q, res, g):
    q, k, v, key_bias = res
    return _backward(q, k, v, key_bias, g, sm_scale)


tome_flash_attention.defvjp(_fwd, _bwd)


# ------------------------------------------------- per-frame (trajectory)


def _make_frame_kernel(frames: int, s_pad: int):
    def _frame_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        """One (bh, q-block) program of PER-FRAME attention — the spatial
        step of Motionformer trajectory attention
        (motionformer_vit_helper.py:236-243). All frames' keys live in
        the program: ONE [blk_q, n_pad] QK matmul (MXU-efficient lane
        dim) followed by a static per-frame loop of softmax + PV on
        contiguous 128-aligned lane slices. Versus the old
        one-frame-per-program grid this is 8x fewer programs and an 8x
        larger QK N dim (measured 3.38 -> ~1.5 ms/layer at ViT-B)."""
        q = q_ref[0]  # [blk_q, d] (pre-scaled)
        k = k_ref[0]  # [n_pad, d] — all frames, per-frame padded
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [blk_q, n_pad]
        s = s + bias_ref[0]  # [1, n_pad] broadcast (-1e30 at pad keys)
        for fi in range(frames):
            sf = s[:, fi * s_pad : (fi + 1) * s_pad]
            m = jnp.max(sf, axis=-1, keepdims=True)
            p = jnp.exp(sf - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype),
                v_ref[0, fi * s_pad : (fi + 1) * s_pad, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, fi] = (o / denom).astype(o_ref.dtype)

    return _frame_kernel


def _frame_blk_q(n: int, n_pad: int, blk_q: int, budget: int = 6_500_000) -> int:
    """Largest q block <= blk_q that divides ceil8(n) exactly (kills q
    padding — 1568 pads 30% to 2048 otherwise) and whose fp32 logits
    tile [blk_q, n_pad] stays within a VMEM budget; falls back to a
    padded 128-multiple block when no divisor exists. The fallback is
    capped at the budget too — an uncapped padded block recreates the
    scoped-VMEM OOM the budget exists to prevent."""
    nq8 = -(-n // 8) * 8
    cap = min(blk_q, nq8, max(128, (budget // (n_pad * 4)) // 8 * 8))
    for c in range(cap - cap % 8, 127, -8):
        if nq8 % c == 0:
            return c
    return min(blk_q, -(-n // _LANE) * _LANE, cap)


def _pad_frames_kv(k, v, frames: int, s_pad: int):
    """Pad keys/values PER FRAME to ``s_pad`` so frame segments stay
    contiguous ([..., f*s_len, d] -> [..., f*s_pad, d]); leading dims
    are preserved. Shared by both frame-kernel forwards and the fused
    backward — their pad semantics must never diverge."""
    *lead, n, d = k.shape
    s_len = n // frames
    ks = k.reshape(*lead, frames, s_len, d)
    vs = v.reshape(*lead, frames, s_len, d)
    if s_pad != s_len:
        pad = [(0, 0)] * (len(lead) + 1) + [(0, s_pad - s_len), (0, 0)]
        ks = jnp.pad(ks, pad)
        vs = jnp.pad(vs, pad)
    return (
        ks.reshape(*lead, frames * s_pad, d),
        vs.reshape(*lead, frames * s_pad, d),
    )


def _frame_key_bias(key_bias, b: int, frames: int, s_len: int, s_pad: int):
    """[B, 1, f*s_pad] fp32 key bias: the proportional-attention
    log(size) per key with -1e30 at per-frame pad columns (pad keys
    get zero softmax weight)."""
    bias = jnp.full((b, frames, s_pad), -1e30, jnp.float32)
    kb = (
        key_bias.astype(jnp.float32).reshape(b, frames, s_len)
        if key_bias is not None
        else jnp.zeros((b, frames, s_len), jnp.float32)
    )
    return bias.at[:, :, :s_len].set(kb).reshape(b, 1, frames * s_pad)


def _frame_forward(q, k, v, key_bias, sm_scale, frames, blk_q):
    b, h, n, d = q.shape
    f = frames
    s_len = n // f
    s_pad = -(-s_len // _LANE) * _LANE
    n_pad = s_pad * f
    blk_q_eff = _frame_blk_q(n, n_pad, blk_q)
    nq_pad = -(-n // blk_q_eff) * blk_q_eff
    dtype = q.dtype

    qs = (q * sm_scale).reshape(b * h, n, d)
    if nq_pad != n:
        qs = jnp.pad(qs, [(0, 0), (0, nq_pad - n), (0, 0)])
    ks, vs = _pad_frames_kv(
        k.reshape(b * h, n, d), v.reshape(b * h, n, d), f, s_pad
    )
    bias = _frame_key_bias(key_bias, b, f, s_len, s_pad)

    grid = (b * h, nq_pad // blk_q_eff)
    out = pl.pallas_call(
        _make_frame_kernel(f, s_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q_eff, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, f, blk_q_eff, d),
            lambda bh, qi: (bh, 0, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, f, nq_pad, d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * nq_pad * n_pad * d,
            bytes_accessed=(3 * b * h * n_pad * d + b * h * nq_pad * f * d) * 2,
            transcendentals=b * h * nq_pad * n_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias)
    out = out[:, :, :n, :].reshape(b, h, f, n, d)
    # token-major output: the ONLY layout change downstream of the
    # kernel — xq/proj_kv/temporal-attention all consume [B, N, F, ...]
    # natively (motionformer.py), so the old extra [B,H,N,F,d] transpose
    # + k2 fold transpose (2 x 154 MB at ViT-B) are gone.
    return jnp.transpose(out, (0, 3, 2, 1, 4))  # [B, N, F, H, d]


def _make_frame_tm_kernel(frames: int, s_pad: int, group: int = 2):
    def _frame_tm_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        """One (b, q-block, head-group) program of per-frame attention
        writing TOKEN-MAJOR output. Each of the group's heads does one
        whole-row QK matmul; per frame their PV outputs concatenate
        into a [blk_q, group*d] lane-aligned column write. The out
        array is [B, nq_pad, f, h*d] and each program's index map owns
        a static group*d-wide column block — the model consumes the
        result as [B, N, F, D] with NO epilogue transpose (the old
        per-head grid needed a [b*h, f, n, d] -> [B, N, F, h, d]
        transpose: 154 MB at ViT-B, the largest remaining layout copy
        per layer). Wider groups write wider contiguous DMA chunks
        (group*d*2 bytes of the 768-lane minor dim) at the cost of
        `group` fp32 logits tiles per program (smaller blk_q)."""
        # all heads' logits tiles upfront (big QK matmuls), then one
        # pass over frames writing each group-column immediately — nothing
        # accumulates across the frame loop (holding all f x group PV
        # outputs live pushed the Mosaic scoped-VMEM stack past 16 MB
        # in-model)
        ss = []
        for j in range(group):
            q = q_ref[0, j]  # [blk_q, d] (pre-scaled)
            k = k_ref[0, j]  # [n_pad, d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [blk_q, n_pad]
            ss.append(s + bias_ref[0])  # [1, n_pad] broadcast (-1e30 at pads)
        for fi in range(frames):
            cols = []
            for j in range(group):
                sf = ss[j][:, fi * s_pad : (fi + 1) * s_pad]
                m = jnp.max(sf, axis=-1, keepdims=True)
                p = jnp.exp(sf - m)
                denom = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v_ref.dtype),
                    v_ref[0, j, fi * s_pad : (fi + 1) * s_pad, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cols.append(o / denom)
            o_ref[0, :, 0, fi, :] = jnp.concatenate(cols, axis=-1).astype(o_ref.dtype)

    return _frame_tm_kernel


def _frame_tm_group(h: int, d: int) -> int:
    """Heads per program for the token-major kernel. Default 2 (the
    measured production choice); VTM_FRAME_TM_GROUP overrides for
    on-chip A/B (wider groups -> wider contiguous output-DMA chunks,
    more fp32 logits VMEM -> smaller blk_q).

    Mosaic validity: the out block's last dim g*d must be a multiple
    of 128 (or equal to the array dim h*d, i.e. g == h). An explicit
    override that violates divisibility or validity RAISES — a
    silently ignored knob corrupts the A/B it exists for. Without an
    override, small-d models fall back to the smallest valid group."""
    env = os.environ.get("VTM_FRAME_TM_GROUP")
    if env is not None:
        g = int(env)
        if not (0 < g <= h and h % g == 0):
            raise ValueError(f"VTM_FRAME_TM_GROUP={g} does not divide h={h}")
        if (g * d) % _LANE != 0 and g != h:
            raise ValueError(
                f"VTM_FRAME_TM_GROUP={g}: out-block width g*d={g * d} is "
                f"neither a multiple of {_LANE} nor the full row h*d"
            )
        return g
    if (2 * d) % _LANE == 0:
        return 2
    return next(
        (c for c in range(2, h) if h % c == 0 and (c * d) % _LANE == 0), h
    )


def _frame_tm_fcs(f: int) -> int:
    """Frames per grid step for the token-major kernels: 4 is the
    measured production choice at the Motionformer shape
    (PROFILE_FRAME_TM.json: 1.71 vs 1.91 ms for 2; whole-model A/B
    PROFILE_FRAME_FCS_AB.json: merged 36.1 vs 37.1 ms) — bigger K/V
    blocks amortise the per-grid-step overhead while ``_frame_blk_q``
    keeps the fp32 logits tiles inside the VMEM budget. fcs=8
    (whole-row) blows that budget and fails to compile.
    VTM_FRAME_TM_FCS overrides for on-chip A/B."""
    fcs = 4 if f % 4 == 0 else (2 if f % 2 == 0 else 1)
    fcs_env = os.environ.get("VTM_FRAME_TM_FCS")
    if fcs_env is not None and int(fcs_env) > 0:
        if f % int(fcs_env) != 0:
            raise ValueError(
                f"VTM_FRAME_TM_FCS={fcs_env} does not divide frames={f}"
            )
        fcs = int(fcs_env)
    return fcs


def _frame_forward_tm(q, k, v, key_bias, sm_scale, frames, blk_q):
    """Token-major-output variant of ``_frame_forward`` for EVEN head
    counts: grid (b, q-block, head-group, frame-chunk), out
    [B, nq_pad, f, h*d] with head-major columns — a free reshape to the
    model's [B, N, F, D]. The frame-chunk grid dim keeps K/V blocks and
    logits tiles small: the scoped-VMEM stack is SHARED with XLA's
    overlapped copies in-model, and full-f K/V blocks (2 x 1 MB double-
    buffered) plus two whole-row fp32 logits tiles blew the 16 MB limit
    inside the merged Motionformer program (~6 MB total at fcs=2,
    blk_q=784).

    Default layout is the transposed sublane-aligned s8 scheme
    (``_frame_forward_tm_s8``): whole-model Motionformer merged 220.8
    -> 234.8 clips/s, baseline 103.8 -> 108.0 (PROFILE_FRAME_S8.json).
    VTM_FRAME_S8=0 keeps the lane-major layout for on-chip A/B."""
    if os.environ.get("VTM_FRAME_S8", "1") == "1":
        return _frame_forward_tm_s8(q, k, v, key_bias, sm_scale, frames, blk_q)
    b, h, n, d = q.shape
    f = frames
    g = _frame_tm_group(h, d)
    fcs = _frame_tm_fcs(f)
    s_len = n // f
    s_pad = -(-s_len // _LANE) * _LANE
    n_pad = s_pad * f
    c_pad = s_pad * fcs
    # `g` fp32 [blk_q, c_pad] logits tiles live per program
    blk_q_eff = _frame_blk_q(n, g * c_pad, blk_q)
    nq_pad = -(-n // blk_q_eff) * blk_q_eff
    dtype = q.dtype

    qs = (q * sm_scale).reshape(b, h, n, d)
    if nq_pad != n:
        qs = jnp.pad(qs, [(0, 0), (0, 0), (0, nq_pad - n), (0, 0)])
    ks, vs = _pad_frames_kv(k, v, f, s_pad)
    bias = _frame_key_bias(key_bias, b, f, s_len, s_pad)

    grid = (b, nq_pad // blk_q_eff, h // g, f // fcs)
    out = pl.pallas_call(
        _make_frame_tm_kernel(fcs, s_pad, g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g, blk_q_eff, d), lambda bi, qi, hp, fc: (bi, hp, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, c_pad, d), lambda bi, qi, hp, fc: (bi, hp, fc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, c_pad, d), lambda bi, qi, hp, fc: (bi, hp, fc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_pad), lambda bi, qi, hp, fc: (bi, 0, fc), memory_space=pltpu.VMEM),
        ],
        # 5-D out so the chunked frame dim is an actual array dim (the
        # Mosaic block rule wants the last-two block dims ÷(8,128) or
        # equal to the array dims; (fcs, g*128) qualifies by equality) —
        # [B, nq, f//fcs, fcs, (h//g)*g*d] reshapes freely to [B,N,F,D]
        out_specs=pl.BlockSpec(
            (1, blk_q_eff, 1, fcs, g * d),
            lambda bi, qi, hp, fc: (bi, qi, fc, 0, hp),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, f // fcs, fcs, h * d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * nq_pad * n_pad * d,
            bytes_accessed=(3 * b * h * n_pad * d + b * nq_pad * f * h * d) * 2,
            transcendentals=b * h * nq_pad * n_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias)
    return out[:, :n].reshape(b, n, f, h, d)


def _make_frame_tm_s8_kernel(fcs: int, s_pad: int, group: int):
    def _frame_tm_s8_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        """Transposed-QK (s8) program: logits are [c_pad, blk_q] with
        the key/frame axis on SUBLANES, so per-frame slices need only
        8-alignment (s_pad = ceil8(s) instead of ceil128 — 196 -> 200
        vs 256 at the Motionformer shape). Softmax reduces over
        sublanes; p is normalised in fp32 BEFORE the PV matmul so no
        [1, blk] -> [blk, 1] denominator transpose is needed."""
        ss = []
        for j in range(group):
            st = jax.lax.dot_general(
                k_ref[0, j],
                q_ref[0, j],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [c_pad, blk_q]
            ss.append(st + bias_ref[0])  # [c_pad, 1] lane-broadcast (-1e30 pads)
        for fi in range(fcs):
            cols = []
            for j in range(group):
                sf = ss[j][fi * s_pad : (fi + 1) * s_pad, :]
                m = jnp.max(sf, axis=0, keepdims=True)  # [1, blk_q]
                p = jnp.exp(sf - m)
                p = p / jnp.sum(p, axis=0, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v_ref.dtype),
                    v_ref[0, j, fi * s_pad : (fi + 1) * s_pad, :],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [blk_q, d]
                cols.append(o)
            o_ref[0, :, 0, fi, :] = jnp.concatenate(cols, axis=-1).astype(
                o_ref.dtype
            )

    return _frame_tm_s8_kernel


def _frame_forward_tm_s8(q, k, v, key_bias, sm_scale, frames, blk_q):
    """Sublane-aligned (s8) variant of ``_frame_forward_tm``: same grid
    and token-major output, but the QK matmul is transposed so the
    frame axis sits on sublanes and per-frame padding drops from
    ceil128 to ceil8 (22% less QK/exp work and smaller K/V blocks at
    s=196). Trade-off: the q-block dim becomes the LANE dim of the
    fp32 logits tile, so non-128-multiple q blocks (784 -> 896
    internal) give back some of the win. Measured net (PROFILE_FRAME_S8
    .json, v5e): standalone -14% at s=196 AND s=106, whole-model merged
    Motionformer +6.4% clips/s — the production default; VTM_FRAME_S8=0
    restores the lane-major layout for A/B."""
    b, h, n, d = q.shape
    f = frames
    g = _frame_tm_group(h, d)
    fcs = _frame_tm_fcs(f)
    s_len = n // f
    s_pad = -(-s_len // 8) * 8
    n_pad = s_pad * f
    c_pad = s_pad * fcs
    blk_q_eff = _frame_blk_q(n, g * c_pad, blk_q)
    nq_pad = -(-n // blk_q_eff) * blk_q_eff
    dtype = q.dtype

    qs = (q * sm_scale).reshape(b, h, n, d)
    if nq_pad != n:
        qs = jnp.pad(qs, [(0, 0), (0, 0), (0, nq_pad - n), (0, 0)])
    ks, vs = _pad_frames_kv(k, v, f, s_pad)
    bias = _frame_key_bias(key_bias, b, f, s_len, s_pad).reshape(
        b, f * s_pad, 1
    )

    grid = (b, nq_pad // blk_q_eff, h // g, f // fcs)
    out = pl.pallas_call(
        _make_frame_tm_s8_kernel(fcs, s_pad, g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g, blk_q_eff, d), lambda bi, qi, hp, fc: (bi, hp, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, c_pad, d), lambda bi, qi, hp, fc: (bi, hp, fc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, c_pad, d), lambda bi, qi, hp, fc: (bi, hp, fc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad, 1), lambda bi, qi, hp, fc: (bi, fc, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q_eff, 1, fcs, g * d),
            lambda bi, qi, hp, fc: (bi, qi, fc, 0, hp),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, f // fcs, fcs, h * d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * nq_pad * n_pad * d,
            bytes_accessed=(3 * b * h * n_pad * d + b * nq_pad * f * h * d) * 2,
            transcendentals=b * h * nq_pad * n_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias)
    return out[:, :n].reshape(b, n, f, h, d)


def _make_frame_bwd_kernel(frames: int, s_pad: int, scale: float):
    def _frame_bwd_kernel(
        q_ref, k_ref, v_ref, bias_ref, do_ref,
        dq_ref, dk_ref, dv_ref, db_ref,
    ):
        """One (b, head-pair, q-block) program of the fused per-frame
        backward. Per head and frame: recompute the softmax row (tiles
        are only [blk_q, s_pad] — the whole-row [blk_q, n_pad] fp32
        logits of the dense backward never materialise), then the
        standard flash bwd algebra
          ds = p * (dp - rowsum(p*dp)),  dp = do v^T
          dq += scale * ds k ;  dk += scale * ds^T q ;  dv += p^T do ;
          dbias += colsum(ds).
        dk/dv/db index maps are constant along the q-block grid dim
        (innermost), so the accumulators stay VMEM-resident across
        sequential q blocks — the same residency scheme as the dense
        ``_bwd_kernel``. ``do`` arrives head-major [b, h, f, nq, d] (one
        transpose outside the kernel) so every block slice is a clean
        (blk_q, d) tile."""
        qi = pl.program_id(2)
        for j in range(2):
            q = q_ref[0, j]  # [blk_q, d] (unscaled)
            k = k_ref[0, j]  # [n_pad, d]
            v = v_ref[0, j]
            dq_acc = None
            for fi in range(frames):
                lo, hi = fi * s_pad, (fi + 1) * s_pad
                kf = k[lo:hi]  # [s_pad, d]
                vf = v[lo:hi]
                sf = (
                    jax.lax.dot_general(
                        q, kf, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias_ref[0][:, lo:hi]  # [1, s_pad] broadcast
                )
                m = jnp.max(sf, axis=-1, keepdims=True)
                p = jnp.exp(sf - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)  # fp32
                dof = do_ref[0, j, fi]  # [blk_q, d]
                dp = jax.lax.dot_general(
                    dof, vf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [blk_q, s_pad]
                delta = jnp.sum(p * dp, axis=-1, keepdims=True)
                ds = p * (dp - delta)
                p_lo = p.astype(dof.dtype)
                ds_lo = ds.astype(dof.dtype)
                dq_par = (
                    jax.lax.dot_general(
                        ds_lo, kf, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )
                dq_acc = dq_par if dq_acc is None else dq_acc + dq_par
                dk_f = (
                    jax.lax.dot_general(
                        ds_lo, q, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )  # [s_pad, d]
                dv_f = jax.lax.dot_general(
                    p_lo, dof, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                db_f = jnp.sum(ds, axis=0, keepdims=True)  # [1, s_pad]

                @pl.when(qi == 0)
                def _():
                    dk_ref[0, j, lo:hi] = dk_f
                    dv_ref[0, j, lo:hi] = dv_f

                @pl.when(qi > 0)
                def _():
                    dk_ref[0, j, lo:hi] += dk_f
                    dv_ref[0, j, lo:hi] += dv_f

                first = jnp.logical_and(qi == 0, j == 0)

                @pl.when(first)
                def _():
                    db_ref[0, :, lo:hi] = db_f

                @pl.when(jnp.logical_not(first))
                def _():
                    db_ref[0, :, lo:hi] += db_f
            dq_ref[0, j] = dq_acc.astype(dq_ref.dtype)

    return _frame_bwd_kernel


def _frame_backward_tm(q, k, v, key_bias, g, sm_scale, frames, blk_q=256):
    """Fused backward for even head counts (head-pair grid like the
    forward). ``g`` is the token-major cotangent [B, N, F, H, d].
    Defaults to the transposed sublane-aligned s8 layout (see
    ``_frame_forward_tm``); VTM_FRAME_S8=0 keeps lane-major for A/B."""
    if os.environ.get("VTM_FRAME_S8", "1") == "1":
        return _frame_backward_tm_s8(
            q, k, v, key_bias, g, sm_scale, frames, blk_q
        )
    b, h, n, d = q.shape
    f = frames
    s_len = n // f
    s_pad = -(-s_len // _LANE) * _LANE
    n_pad = s_pad * f
    blk_q_eff = _frame_blk_q(n, 3 * s_pad, blk_q)
    nq_pad = -(-n // blk_q_eff) * blk_q_eff
    dtype = q.dtype

    qs = q
    if nq_pad != n:
        qs = jnp.pad(qs, [(0, 0), (0, 0), (0, nq_pad - n), (0, 0)])
    ks, vs = _pad_frames_kv(k, v, f, s_pad)

    # one head-major transpose of the cotangent outside the kernel buys
    # clean (blk_q, d) do tiles inside (64-lane intra-register head
    # slices of the token-major layout are not Mosaic-safe)
    gs = g
    if nq_pad != n:
        gs = jnp.pad(gs, [(0, 0), (0, nq_pad - n), (0, 0), (0, 0), (0, 0)])
    gs = jnp.transpose(gs, (0, 3, 2, 1, 4))  # [B, H, F, nq_pad, d]

    bias = _frame_key_bias(key_bias, b, f, s_len, s_pad)

    grid = (b, h // 2, nq_pad // blk_q_eff)
    dq, dk, dv, db = pl.pallas_call(
        _make_frame_bwd_kernel(f, s_pad, sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, blk_q_eff, d), lambda bi, hp, qi: (bi, hp, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bi, hp, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, f, blk_q_eff, d), lambda bi, hp, qi: (bi, hp, 0, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, blk_q_eff, d), lambda bi, hp, qi: (bi, hp, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bi, hp, qi: (bi, hp, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq_pad, d), dtype),
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h // 2, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * nq_pad * n_pad * d,
            bytes_accessed=(7 * b * h * n_pad * d) * 2,
            transcendentals=b * h * nq_pad * n_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias, gs)

    dq = dq[:, :, :n, :]
    dk = dk.reshape(b, h, f, s_pad, d)[:, :, :, :s_len].reshape(b, h, n, d)
    dv = dv.reshape(b, h, f, s_pad, d)[:, :, :, :s_len].reshape(b, h, n, d)
    if key_bias is None:
        dbias = None
    else:
        dbias = (
            db.sum(axis=1)
            .reshape(b, f, s_pad)[:, :, :s_len]
            .reshape(b, n)
            .astype(key_bias.dtype)
        )
    return dq, dk.astype(dtype), dv.astype(dtype), dbias


def _make_frame_bwd_s8_kernel(frames: int, s_pad: int, scale: float):
    def _frame_bwd_s8_kernel(
        q_ref, k_ref, v_ref, bias_ref, do_ref,
        dq_ref, dk_ref, dv_ref, db_ref,
    ):
        """Transposed (s8) backward program: the recomputed per-frame
        softmax tiles are [s_pad, blk_q] with the key axis on SUBLANES
        (s_pad = ceil8(s), not ceil128 — same win as the s8 forward),
        the bias is a column slice, and EVERY dot of the flash-bwd
        algebra lands transpose-free in this layout:
          dp = v do^T ; ds = p (dp - colsum(p dp))
          dq += scale ds^T k ; dk += scale ds q ; dv += p do ;
          db += rowsum(ds)  (a [s_pad, 1] column).
        Accumulator residency across sequential q blocks is identical
        to ``_make_frame_bwd_kernel``."""
        qi = pl.program_id(2)
        for j in range(2):
            q = q_ref[0, j]  # [blk_q, d] (unscaled)
            k = k_ref[0, j]  # [n_pad, d]
            v = v_ref[0, j]
            dq_acc = None
            for fi in range(frames):
                lo, hi = fi * s_pad, (fi + 1) * s_pad
                kf = k[lo:hi]  # [s_pad, d]
                vf = v[lo:hi]
                sf = (
                    jax.lax.dot_general(
                        kf, q, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias_ref[0][lo:hi]  # [s_pad, 1] lane-broadcast
                )  # [s_pad, blk_q]
                m = jnp.max(sf, axis=0, keepdims=True)
                p = jnp.exp(sf - m)
                p = p / jnp.sum(p, axis=0, keepdims=True)  # fp32
                dof = do_ref[0, j, fi]  # [blk_q, d]
                dp = jax.lax.dot_general(
                    vf, dof, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [s_pad, blk_q]
                delta = jnp.sum(p * dp, axis=0, keepdims=True)  # [1, blk_q]
                ds = p * (dp - delta)
                p_lo = p.astype(dof.dtype)
                ds_lo = ds.astype(dof.dtype)
                dq_par = (
                    jax.lax.dot_general(
                        ds_lo, kf, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )  # [blk_q, d]
                dq_acc = dq_par if dq_acc is None else dq_acc + dq_par
                dk_f = (
                    jax.lax.dot_general(
                        ds_lo, q, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )  # [s_pad, d]
                dv_f = jax.lax.dot_general(
                    p_lo, dof, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [s_pad, d]
                db_f = jnp.sum(ds, axis=1, keepdims=True)  # [s_pad, 1]

                @pl.when(qi == 0)
                def _():
                    dk_ref[0, j, lo:hi] = dk_f
                    dv_ref[0, j, lo:hi] = dv_f

                @pl.when(qi > 0)
                def _():
                    dk_ref[0, j, lo:hi] += dk_f
                    dv_ref[0, j, lo:hi] += dv_f

                first = jnp.logical_and(qi == 0, j == 0)

                @pl.when(first)
                def _():
                    db_ref[0, 0, lo:hi] = db_f

                @pl.when(jnp.logical_not(first))
                def _():
                    db_ref[0, 0, lo:hi] += db_f
            dq_ref[0, j] = dq_acc.astype(dq_ref.dtype)

    return _frame_bwd_s8_kernel


def _frame_backward_tm_s8(q, k, v, key_bias, g, sm_scale, frames, blk_q=256):
    """s8 (sublane-aligned) variant of ``_frame_backward_tm`` — same
    grid/accumulator scheme, per-frame padding ceil8 instead of
    ceil128, bias and dbias as [n_pad, 1] columns."""
    b, h, n, d = q.shape
    f = frames
    s_len = n // f
    s_pad = -(-s_len // 8) * 8
    n_pad = s_pad * f
    blk_q_eff = _frame_blk_q(n, 3 * s_pad, blk_q)
    nq_pad = -(-n // blk_q_eff) * blk_q_eff
    dtype = q.dtype

    qs = q
    if nq_pad != n:
        qs = jnp.pad(qs, [(0, 0), (0, 0), (0, nq_pad - n), (0, 0)])
    ks, vs = _pad_frames_kv(k, v, f, s_pad)

    gs = g
    if nq_pad != n:
        gs = jnp.pad(gs, [(0, 0), (0, nq_pad - n), (0, 0), (0, 0), (0, 0)])
    gs = jnp.transpose(gs, (0, 3, 2, 1, 4))  # [B, H, F, nq_pad, d]

    bias = _frame_key_bias(key_bias, b, f, s_len, s_pad).reshape(
        b, f * s_pad, 1
    )

    grid = (b, h // 2, nq_pad // blk_q_eff)
    dq, dk, dv, db = pl.pallas_call(
        _make_frame_bwd_s8_kernel(f, s_pad, sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, blk_q_eff, d), lambda bi, hp, qi: (bi, hp, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 1), lambda bi, hp, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, f, blk_q_eff, d), lambda bi, hp, qi: (bi, hp, 0, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, blk_q_eff, d), lambda bi, hp, qi: (bi, hp, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_pad, d), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad, 1), lambda bi, hp, qi: (bi, hp, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq_pad, d), dtype),
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h // 2, n_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * nq_pad * n_pad * d,
            bytes_accessed=(7 * b * h * n_pad * d) * 2,
            transcendentals=b * h * nq_pad * n_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias, gs)

    dq = dq[:, :, :n, :]
    dk = dk.reshape(b, h, f, s_pad, d)[:, :, :, :s_len].reshape(b, h, n, d)
    dv = dv.reshape(b, h, f, s_pad, d)[:, :, :, :s_len].reshape(b, h, n, d)
    if key_bias is None:
        dbias = None
    else:
        dbias = (
            db.sum(axis=1)
            .reshape(b, f, s_pad)[:, :, :s_len]
            .reshape(b, n)
            .astype(key_bias.dtype)
        )
    return dq, dk.astype(dtype), dv.astype(dtype), dbias


def _frame_reference(q, k, v, key_bias, sm_scale, frames):
    b, h, n, d = q.shape
    f = frames
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * sm_scale, k, preferred_element_type=jnp.float32
    )
    if key_bias is not None:
        logits = logits + key_bias.astype(jnp.float32)[:, None, None, :]
    logits = logits.reshape(b, h, n, f, n // f)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqfn,bhfnd->bqfhd", probs, v.reshape(b, h, f, n // f, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def tome_frame_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: Optional[jax.Array] = None,
    sm_scale: float = 1.0,
    frames: int = 8,
    blk_q: int = 784,
):
    """Per-frame softmax attention, fused: returns token-major
    [B, N, F, H, d] (q/k/v: [B, H, N, d] with keys frame-major;
    key_bias: [B, N]). ``blk_q`` is an upper bound — the actual block
    is the largest exact divisor of ceil8(N) (see ``_frame_blk_q``).
    Even head counts take the head-pair grid whose output is already
    token-major in HBM (``_frame_forward_tm``); odd counts keep the
    per-head grid + epilogue transpose."""
    return _frame_dispatch(q, k, v, key_bias, sm_scale, frames, blk_q)


def _frame_dispatch(q, k, v, key_bias, sm_scale, frames, blk_q):
    if q.shape[1] % 2 == 0:
        return _frame_forward_tm(q, k, v, key_bias, sm_scale, frames, blk_q)
    return _frame_forward(q, k, v, key_bias, sm_scale, frames, blk_q)


def _frame_fwd(q, k, v, key_bias, sm_scale, frames, blk_q):
    return _frame_dispatch(q, k, v, key_bias, sm_scale, frames, blk_q), (q, k, v, key_bias)


def _frame_bwd(sm_scale, frames, blk_q, res, g):
    q, k, v, key_bias = res
    # the whole-row VMEM cap is checked at the ACTIVE layout's padding:
    # the default s8 scheme pads per frame to ceil8 (so e.g. 16 frames
    # of s=127 -> 2048 still take the fused kernel), lane-major ceil128
    align = 8 if os.environ.get("VTM_FRAME_S8", "1") == "1" else _LANE
    s_pad = -(-(q.shape[2] // frames) // align) * align
    if q.shape[1] % 2 == 0 and frames * s_pad <= 2048:
        # fused kernel: per-frame softmax recompute in [blk_q, s_pad]
        # tiles — the dense-reference vjp below materialises the whole
        # [b, h, n, n] fp32 logits (945 MB at ViT-B/224 f8) per layer
        return _frame_backward_tm(q, k, v, key_bias, g, sm_scale, frames)
    # odd head counts / very long rows: dense recompute fallback
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _frame_reference(q_, k_, v_, b_, sm_scale, frames),
        q, k, v, key_bias,
    )
    return vjp(g)


tome_frame_attention.defvjp(_frame_fwd, _frame_bwd)


# --------------------------------------------- block-diagonal (per-frame)


def _make_blockdiag_kernel(fcs: int, s_pad: int, group: int, masked_rows: bool):
    def _blockdiag_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        """One (b, head-group, frame-chunk) program of BLOCK-DIAGONAL
        per-frame attention — TimeSformer's divided spatial attention
        (reference tome/patch/timesformer.py:60-83): each frame's
        queries attend only to that frame's keys, unlike the trajectory
        frame kernel where every query attends to every frame. Per
        (head, frame): one [s_pad, s_pad] fp32 logits tile (never in
        HBM — the einsum path materialises [bt, h, s, s] fp32 per
        layer), softmax, PV; the group's head columns concatenate into
        one token-major lane-aligned write. ``masked_rows`` applies the
        size bias to rows > 0 only (the CLS-excluded proportional
        attention: logits[:, :, 1:, 1:] += log size); bias row 0 is the
        pad mask (-1e30 at pad keys), applied to ALL rows so the CLS
        query cannot attend to padding."""
        for fi in range(fcs):
            lo = fi * s_pad
            cols = []
            for j in range(group):
                qf = q_ref[0, j, lo : lo + s_pad, :]  # [s_pad, d] (pre-scaled)
                kf = k_ref[0, j, lo : lo + s_pad, :]
                s = jax.lax.dot_general(
                    qf, kf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [s_pad, s_pad]
                s = s + bias_ref[0, 0, lo : lo + s_pad][None, :]
                size_b = bias_ref[0, 1, lo : lo + s_pad][None, :]
                if masked_rows:
                    row = (
                        jax.lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0) > 0
                    ).astype(jnp.float32)
                    s = s + row * size_b
                else:
                    s = s + size_b
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                denom = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v_ref.dtype),
                    v_ref[0, j, lo : lo + s_pad, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cols.append(o / denom)
            o_ref[0, lo : lo + s_pad, :] = jnp.concatenate(cols, axis=-1).astype(
                o_ref.dtype
            )

    return _blockdiag_kernel


def _blockdiag_group(h: int, d: int) -> int:
    """Heads per program. Same Mosaic validity rule as the trajectory
    kernel (out-block width g*d a multiple of 128, or g == h);
    VTM_BLOCKDIAG_GROUP overrides for on-chip A/B."""
    env = os.environ.get("VTM_BLOCKDIAG_GROUP")
    if env is not None:
        g = int(env)
        if not (0 < g <= h and h % g == 0):
            raise ValueError(f"VTM_BLOCKDIAG_GROUP={g} does not divide h={h}")
        if (g * d) % _LANE != 0 and g != h:
            raise ValueError(
                f"VTM_BLOCKDIAG_GROUP={g}: out-block width g*d={g * d} is "
                f"neither a multiple of {_LANE} nor the full row h*d"
            )
        return g
    # unlike the trajectory kernel (whose dispatch gates on h % 2 == 0),
    # this kernel is called for any h — the fast path must check
    # divisibility itself or odd-h grids silently skip the last head
    if h % 2 == 0 and (2 * d) % _LANE == 0:
        return 2
    return next(
        (c for c in range(2, h) if h % c == 0 and (c * d) % _LANE == 0), h
    )


def _blockdiag_fcs(f: int) -> int:
    env = os.environ.get("VTM_BLOCKDIAG_FCS")
    if env is not None and int(env) > 0:
        if f % int(env) != 0:
            raise ValueError(f"VTM_BLOCKDIAG_FCS={env} does not divide frames={f}")
        return int(env)
    return 2 if f % 2 == 0 else 1


def _blockdiag_bias(key_bias, b: int, frames: int, s_len: int, s_pad: int):
    """[B, 2, f*s_pad] fp32: row 0 = pad mask (0 at real keys, -1e30 at
    per-frame pad columns, applied to every query row), row 1 = size
    bias (log token sizes, 0 at pads — row-masked in the kernel when
    the CLS row is excluded)."""
    pad_row = jnp.full((b, frames, s_pad), -1e30, jnp.float32)
    pad_row = pad_row.at[:, :, :s_len].set(0.0)
    size_row = jnp.zeros((b, frames, s_pad), jnp.float32)
    if key_bias is not None:
        size_row = size_row.at[:, :, :s_len].set(
            key_bias.astype(jnp.float32).reshape(b, frames, s_len)
        )
    return jnp.stack(
        [pad_row.reshape(b, -1), size_row.reshape(b, -1)], axis=1
    )


def _blockdiag_forward(q, k, v, key_bias, sm_scale, frames, exclude_first_row):
    b, h, n, d = q.shape
    f = frames
    s_len = n // f
    s_pad = -(-s_len // _LANE) * _LANE
    n_pad = s_pad * f
    g = _blockdiag_group(h, d)
    fcs = _blockdiag_fcs(f)
    c_pad = s_pad * fcs
    dtype = q.dtype

    qs, _ = _pad_frames_kv(q * sm_scale, q, f, s_pad)
    ks, vs = _pad_frames_kv(k, v, f, s_pad)
    bias = _blockdiag_bias(key_bias, b, f, s_len, s_pad)

    grid = (b, h // g, f // fcs)
    out = pl.pallas_call(
        _make_blockdiag_kernel(
            fcs, s_pad, g, exclude_first_row and key_bias is not None
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g, c_pad, d), lambda bi, hp, fc: (bi, hp, fc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, c_pad, d), lambda bi, hp, fc: (bi, hp, fc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, c_pad, d), lambda bi, hp, fc: (bi, hp, fc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c_pad), lambda bi, hp, fc: (bi, 0, fc), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_pad, g * d), lambda bi, hp, fc: (bi, fc, hp), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h * d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n_pad * s_pad * d,
            bytes_accessed=(3 * b * h * n_pad * d + b * n_pad * h * d) * 2,
            transcendentals=b * h * n_pad * s_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias)
    return out.reshape(b, f, s_pad, h * d)[:, :, :s_len].reshape(b, n, h * d)


def _make_blockdiag_bwd_kernel(
    fcs: int, s_pad: int, group: int, masked_rows: bool, scale: float
):
    def _blockdiag_bwd_kernel(
        q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, db_ref
    ):
        """Fused block-diagonal backward. Every (head, frame) pair
        belongs to exactly ONE program (queries of a frame attend only
        within it), so dq/dk/dv are pure local writes — no cross-
        program accumulation, unlike the dense/trajectory backwards.
        Softmax recompute per (head, frame) in a [s_pad, s_pad] tile;
        the size-bias cotangent sums ds over the non-CLS rows only when
        the forward row-masked it."""
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0) > 0
        ).astype(jnp.float32)
        for fi in range(fcs):
            lo = fi * s_pad
            db_acc = None
            for j in range(group):
                qf = q_ref[0, j, lo : lo + s_pad, :]  # [s_pad, d] (unscaled)
                kf = k_ref[0, j, lo : lo + s_pad, :]
                vf = v_ref[0, j, lo : lo + s_pad, :]
                s = (
                    jax.lax.dot_general(
                        qf, kf, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                    + bias_ref[0, 0, lo : lo + s_pad][None, :]
                )
                size_b = bias_ref[0, 1, lo : lo + s_pad][None, :]
                s = s + (row * size_b if masked_rows else size_b)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)  # fp32
                dof = do_ref[0, j, lo : lo + s_pad, :]
                dp = jax.lax.dot_general(
                    dof, vf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(p * dp, axis=-1, keepdims=True)
                ds = p * (dp - delta)  # fp32
                p_lo = p.astype(dof.dtype)
                ds_lo = ds.astype(dof.dtype)
                dq_ref[0, j, lo : lo + s_pad, :] = jax.lax.dot_general(
                    ds_lo, kf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                dk_ref[0, j, lo : lo + s_pad, :] = jax.lax.dot_general(
                    ds_lo, qf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                dv_ref[0, j, lo : lo + s_pad, :] = jax.lax.dot_general(
                    p_lo, dof, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                db_j = jnp.sum(
                    ds * row if masked_rows else ds, axis=0, keepdims=True
                )
                db_acc = db_j if db_acc is None else db_acc + db_j
            db_ref[0, :, lo : lo + s_pad] = db_acc

    return _blockdiag_bwd_kernel


def _blockdiag_backward(q, k, v, key_bias, g, sm_scale, frames, exclude_first_row):
    b, h, n, d = q.shape
    f = frames
    s_len = n // f
    s_pad = -(-s_len // _LANE) * _LANE
    n_pad = s_pad * f
    grp = _blockdiag_group(h, d)
    fcs = _blockdiag_fcs(f)
    c_pad = s_pad * fcs
    dtype = q.dtype

    qs, _ = _pad_frames_kv(q, q, f, s_pad)
    ks, vs = _pad_frames_kv(k, v, f, s_pad)
    bias = _blockdiag_bias(key_bias, b, f, s_len, s_pad)
    # head-major cotangent (one transpose outside — 64-lane intra-
    # register head slices of the token-major layout aren't Mosaic-safe)
    gs = g.reshape(b, f, s_len, h, d)
    if s_pad != s_len:
        gs = jnp.pad(gs, [(0, 0), (0, 0), (0, s_pad - s_len), (0, 0), (0, 0)])
    gs = jnp.transpose(gs.reshape(b, n_pad, h, d), (0, 2, 1, 3))

    masked = exclude_first_row and key_bias is not None
    grid = (b, h // grp, f // fcs)
    blk = lambda bi, hp, fc: (bi, hp, fc, 0)  # noqa: E731
    dq, dk, dv, db = pl.pallas_call(
        _make_blockdiag_bwd_kernel(fcs, s_pad, grp, masked, sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, grp, c_pad, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, c_pad, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, c_pad, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c_pad), lambda bi, hp, fc: (bi, 0, fc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, c_pad, d), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, grp, c_pad, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, c_pad, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, c_pad, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_pad), lambda bi, hp, fc: (bi, hp, fc), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h // grp, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * n_pad * s_pad * d,
            bytes_accessed=(7 * b * h * n_pad * d) * 2,
            transcendentals=b * h * n_pad * s_pad,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias, gs)

    def _unpad(z):
        return z.reshape(b, h, f, s_pad, d)[:, :, :, :s_len].reshape(b, h, n, d)

    dq, dk, dv = _unpad(dq).astype(dtype), _unpad(dk).astype(dtype), _unpad(dv).astype(dtype)
    if key_bias is None:
        dbias = None
    else:
        dbias = (
            db.sum(axis=1)
            .reshape(b, f, s_pad)[:, :, :s_len]
            .reshape(b, n)
            .astype(key_bias.dtype)
        )
    return dq, dk, dv, dbias


def _blockdiag_reference(q, k, v, key_bias, sm_scale, frames, exclude_first_row=False):
    b, h, n, d = q.shape
    f = frames
    s = n // f
    qf = (q * sm_scale).reshape(b, h, f, s, d)
    kf = k.reshape(b, h, f, s, d)
    vf = v.reshape(b, h, f, s, d)
    logits = jnp.einsum(
        "bhfqd,bhfkd->bhfqk", qf, kf, preferred_element_type=jnp.float32
    )
    if key_bias is not None:
        kb = key_bias.astype(jnp.float32).reshape(b, f, s)[:, None, :, None, :]
        if exclude_first_row:
            rmask = (jnp.arange(s) > 0).astype(jnp.float32)[
                None, None, None, :, None
            ]
            kb = rmask * kb
        logits = logits + kb
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhfqk,bhfkd->bhfqd", probs, vf)
    return jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, n, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def tome_blockdiag_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: Optional[jax.Array] = None,
    sm_scale: float = 1.0,
    frames: int = 8,
    exclude_first_row: bool = False,
):
    """Block-diagonal per-frame attention, fused: frame fi's queries
    attend ONLY to frame fi's keys (TimeSformer divided spatial
    attention folded as [B, f*s] frame-major — reference
    tome/patch/timesformer.py:60-83 runs it as a (b t) batch).

    q/k/v: [B, H, N, d] with N = frames * s frame-major; key_bias:
    [B, N] log token sizes (entry 0 of each frame = CLS = 0) or None.
    ``exclude_first_row``: apply the bias to query rows > 0 of each
    frame only (the reference's logits[:, :, 1:, 1:] += log size).
    Returns token-major [B, N, H*d] (merged heads — no epilogue
    transpose)."""
    return _blockdiag_forward(q, k, v, key_bias, sm_scale, frames, exclude_first_row)


def _blockdiag_fwd(q, k, v, key_bias, sm_scale, frames, exclude_first_row):
    return (
        _blockdiag_forward(q, k, v, key_bias, sm_scale, frames, exclude_first_row),
        (q, k, v, key_bias),
    )


def _blockdiag_bwd(sm_scale, frames, exclude_first_row, res, g):
    q, k, v, key_bias = res
    return _blockdiag_backward(
        q, k, v, key_bias, g, sm_scale, frames, exclude_first_row
    )


tome_blockdiag_attention.defvjp(_blockdiag_fwd, _blockdiag_bwd)
