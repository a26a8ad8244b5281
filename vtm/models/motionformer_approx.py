"""Approximate spatial attention for Motionformer trajectory attention.

Parity targets: slowfast/models/motionformer_nystrom_helper.py
(nystrom_spatial_attn:35-111, iterative_inv:12-32),
motionformer_orthoformer_helper.py (orthogonal_landmarks:11-67,
orthoformer:70-121) and motionformer_performer_helper.py
(create_projection_matrix, softmax_kernel_transformation), selected via
``MOTIONFORMER.APPROX_ATTN_TYPE`` (builder:260-261).

All functions operate on flattened-head tensors ``[B*, N, D]`` (B* may
include the head axis) and return ``[B*, N, F, D]`` — per-query,
per-frame aggregated values, the shape the trajectory step consumes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

BIG_CONSTANT = 1e8


# -------------------------------------------------------------------- nystrom


def iterative_inv(mat: jnp.ndarray, n_iter: int = 6) -> jnp.ndarray:
    """Newton-Schulz pseudo-inverse iterations (reference
    nystrom_helper.iterative_inv:12-32, init_option='exact')."""
    i_mat = jnp.eye(mat.shape[-2], dtype=mat.dtype)
    k_mat = mat
    # 'exact' init: V = K^T / (max_row_sum * max_col_sum)
    v_mat = k_mat.swapaxes(-1, -2) / (
        jnp.max(jnp.sum(k_mat, axis=-2), axis=-1)[..., None, None]
        * jnp.max(jnp.sum(k_mat, axis=-1), axis=-1)[..., None, None]
    )
    for _ in range(n_iter):
        kv = k_mat @ v_mat
        v_mat = 0.25 * v_mat @ (13 * i_mat - kv @ (15 * i_mat - kv @ (7 * i_mat - kv)))
    return v_mat


def _segment_means(x: jnp.ndarray, landmarks: int) -> jnp.ndarray:
    """[B, N, D] -> [B, landmarks, D] segment means, reproducing the
    uneven-split math of the reference (:52-92): the first
    ``num_k = (segs+1)*landmarks - N`` landmarks average ``segs``
    elements, the rest ``segs + 1``."""
    b, n, d = x.shape
    if n % landmarks == 0:
        return x.reshape(b, landmarks, n // landmarks, d).mean(axis=-2)
    segs = n // landmarks
    num_k = (segs + 1) * landmarks - n
    first = x[:, : num_k * segs, :].reshape(b, num_k, segs, d).mean(axis=-2)
    last = (
        x[:, num_k * segs :, :]
        .reshape(b, landmarks - num_k, segs + 1, d)
        .mean(axis=-2)
    )
    return jnp.concatenate([first, last], axis=-2)


def nystrom_spatial_attn(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    landmarks: int = 64,
    num_frames: Optional[int] = None,
    inv_iters: int = 6,
    use_spatial_landmarks: bool = True,
) -> jnp.ndarray:
    """Full space-time Nystrom attention with per-frame softmax
    (reference nystrom_helper.nystrom_spatial_attn:35-111).
    q/k/v: [B, N, D] with N = F*P; returns [B, N, F, D]."""
    b, n, d = k.shape
    f = num_frames
    q = q * d ** -0.5

    if use_spatial_landmarks:
        # transpose (f p) -> (p f) before segmenting
        def to_pf(t):
            return t.reshape(b, f, n // f, d).swapaxes(1, 2).reshape(b, n, d)

        q_land = _segment_means(to_pf(q), landmarks)
        k_land = _segment_means(to_pf(k), landmarks)
    else:
        q_land = _segment_means(q, landmarks)
        k_land = _segment_means(k, landmarks)

    kernel_1 = jax.nn.softmax(q @ k_land.swapaxes(-1, -2), axis=-1)
    kernel_2 = jax.nn.softmax(q_land @ k_land.swapaxes(-1, -2), axis=-1)
    kernel_3 = jax.nn.softmax(
        (q_land @ k.swapaxes(-1, -2)).reshape(b, landmarks, f, n // f), axis=-1
    )
    attn = kernel_1 @ iterative_inv(kernel_2, n_iter=inv_iters)
    v_f = v.reshape(b, f, n // f, d)
    lv = jnp.einsum("blfp,bfpd->blfd", kernel_3, v_f)
    return jnp.einsum("bnl,blfd->bnfd", attn, lv)


# ----------------------------------------------------------------- orthoformer


def orthogonal_landmarks(
    q: jnp.ndarray,
    k: jnp.ndarray,
    num_landmarks: int = 64,
    init_idx: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Greedy selection of maximally-orthogonal landmark queries
    (reference orthoformer_helper.orthogonal_landmarks:11-67).
    The initial landmark is random in the reference; pass ``init_idx``
    [B] or an ``rng`` for reproducibility (defaults to index 0)."""
    b, n, d = q.shape
    qk = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    if init_idx is None:
        if rng is not None:
            init_idx = jax.random.randint(rng, (b,), 0, n)
        else:
            init_idx = jnp.zeros((b,), jnp.int32)

    def body(m, state):
        selected_mask, cos_sims, cur_idx = state
        cur = jnp.take_along_axis(qk, cur_idx[:, None, None], axis=1)[:, 0]  # [B,D]
        cos = jnp.abs(jnp.einsum("bnd,bd->bn", qk, cur))
        cos_sims = jax.lax.dynamic_update_index_in_dim(
            cos_sims, cos, m - 1, axis=2
        )
        # mask over landmark columns >= m
        col = jnp.arange(cos_sims.shape[2])
        seen = jnp.where(col[None, None, :] < m, cos_sims, -jnp.inf)
        # already-selected rows get similarity 10 (always max)
        selected_mask = selected_mask.at[jnp.arange(b), cur_idx].set(True)
        row_max = jnp.max(seen, axis=-1)  # [B, N]
        row_max = jnp.where(selected_mask, 10.0, row_max)
        nxt = jnp.argmin(row_max, axis=-1)
        return selected_mask, cos_sims, nxt

    selected_mask = jnp.zeros((b, n), bool)
    cos_sims = jnp.zeros((b, n, num_landmarks), q.dtype)
    cur = init_idx.astype(jnp.int32)
    order = [cur]
    state = (selected_mask, cos_sims, cur)
    for m in range(1, num_landmarks):
        state = body(m, state)
        order.append(state[2])
    sel_idx = jnp.stack(order, axis=1)  # [B, M] in selection order
    # reference returns landmarks in INDEX order (masked_select)
    sel_sorted = jnp.sort(sel_idx, axis=1)
    return jnp.take_along_axis(q, sel_sorted[:, :, None], axis=1)


def orthoformer(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_landmarks: int = 64,
    num_frames: Optional[int] = None,
    init_idx: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Shared-landmark orthoformer attention (reference
    orthoformer_helper.orthoformer:70-103). q/k/v: [B, N, D];
    returns [B, N, F, D]."""
    b, n, d = k.shape
    f = num_frames
    scale = d ** -0.25
    q = q * scale
    k = k * scale
    landmarks = jax.lax.stop_gradient(
        orthogonal_landmarks(q, k, num_landmarks, init_idx, rng)
    )
    kernel_1 = jax.nn.softmax(q @ landmarks.swapaxes(-1, -2), axis=-1)
    kernel_2 = jax.nn.softmax(
        (landmarks @ k.swapaxes(-1, -2)).reshape(b, num_landmarks, f, n // f),
        axis=-1,
    )
    v_f = v.reshape(b, f, n // f, d)
    x = jnp.einsum("blfp,bfpd->blfd", kernel_2, v_f)
    return jnp.einsum("bnl,blfd->bnfd", kernel_1, x)


# ------------------------------------------------------------------ performer


def create_projection_matrix(m: int, d: int, rng: jax.Array) -> jnp.ndarray:
    """m x d block-orthogonal Gaussian projections (reference
    performer_helper.create_projection_matrix — QR per d-block,
    rows scaled to the chi(d) norm of a Gaussian row)."""
    blocks = []
    nb = m // d
    keys = jax.random.split(rng, nb + 2)
    for i in range(nb):
        g = jax.random.normal(keys[i], (d, d))
        qmat, _ = jnp.linalg.qr(g)
        blocks.append(qmat.T)
    rem = m - nb * d
    if rem > 0:
        g = jax.random.normal(keys[nb], (d, d))
        qmat, _ = jnp.linalg.qr(g)
        blocks.append(qmat.T[:rem])
    proj = jnp.concatenate(blocks, axis=0)
    norms = jnp.linalg.norm(jax.random.normal(keys[nb + 1], (m, d)), axis=1)
    return norms[:, None] * proj


def softmax_kernel_transformation(
    data: jnp.ndarray,
    is_query: bool,
    projection_matrix: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """FAVOR+ positive softmax features (reference
    performer_helper.softmax_kernel_transformation). data: [B, N, H, D]."""
    m = projection_matrix.shape[0]
    data_normalizer = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(data.shape[-1], data.dtype)))
    ratio = 1.0 / jnp.sqrt(jnp.asarray(m, data.dtype))
    dash = jnp.einsum("bnhd,md->bnhm", data_normalizer * data, projection_matrix)
    diag = jnp.sum(data * data, axis=-1) * (data_normalizer ** 2) * 0.5  # [B,N,H]
    if is_query:
        stab = jnp.max(dash, axis=-1, keepdims=True)
    else:
        stab = jnp.max(dash, axis=(-1, -3), keepdims=True)
    return ratio * (jnp.exp(dash - diag[..., None] - stab) + eps)


def performer_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_frames: int,
    m: int = 256,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """FAVOR+ per-frame attention (reference trajectory attention
    performer branch, motionformer_vit_helper.py:207-233).
    q/k/v: [B, N, D]; returns [B, N, F, D]."""
    b, n, d = q.shape
    f = num_frames
    if rng is None:
        # the reference derives a deterministic seed from the inputs
        seed = jnp.ceil(jnp.abs(jnp.sum(q) * BIG_CONSTANT)).astype(jnp.uint32)
        rng = jax.random.fold_in(jax.random.key(0), seed)
    proj = create_projection_matrix(m, d, rng)
    # feature maps expect [B, N, H, D]; single pseudo-head here
    q_prime = softmax_kernel_transformation(q[:, :, None, :], True, proj)[:, :, 0]
    k_prime = softmax_kernel_transformation(k[:, :, None, :], False, proj)[:, :, 0]
    k_f = k_prime.reshape(b, f, n // f, m)
    v_f = v.reshape(b, f, n // f, d)
    kv = jnp.einsum("bfnr,bfnd->bfrd", k_f, v_f)
    qkv = jnp.einsum("bpr,bfrd->bpfd", q_prime, kv)
    normaliser = jnp.einsum("bfnr->bfr", k_f)
    normaliser = jnp.einsum("bpr,bfr->bpf", q_prime, normaliser)
    return qkv / normaliser[..., None]
