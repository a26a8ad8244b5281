"""Bipartite soft matching — the ToMe core — in JAX, TPU-first.

Re-implements the algorithms of the reference ``tome/merge.py``
(bipartite_soft_matching: merge.py:17-102, drop: 215-271,
hybrid: 274-352, kth: 105-158, random-partition: 161-212,
merge_wavg: 355-369, merge_source: 372-384) with a TPU-native design:

  * ``r`` is a static Python int. The output token count ``n - r`` is a
    compile-time constant, so XLA compiles each transformer layer with
    its own (shrinking) shapes — no dynamic shapes, no retracing.
  * Matching decisions (normalise -> a@b.T -> rowmax -> argsort) are
    computed in float32 regardless of the activation dtype, so bf16
    inference makes the same merge decisions as fp32.
  * Instead of returning closures, matching returns a ``Matching``
    pytree of index arrays; ``merge`` / ``unmerge`` / ``drop`` are pure
    functions of it. This keeps everything jit/vmap/scan-friendly and
    lets the same matching be applied to x, size and source.

The token bookkeeping is identical to the reference:
  tokens are split (even positions -> set A / "src", odd -> set B /
  "dst"); each src's best dst is found by cosine similarity; the r
  highest-scoring srcs are merged into their dsts; output order is
  [unmerged-srcs (score-desc, or index-asc when a class token is
  protected), dsts].
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Matching:
    """Result of a bipartite soft matching over ``n`` tokens.

    Index arrays all refer to rows of the even/odd split:
      unm_idx: [B, ta - r]  rows of A kept (in output order)
      src_idx: [B, r]       rows of A merged/dropped
      dst_idx: [B, r]       the B-row each merged src goes to
      src_score: [B, r]     the matching score of each merged edge
                            (needed for hybrid thresholding)
    """

    unm_idx: jax.Array
    src_idx: jax.Array
    dst_idx: jax.Array
    src_score: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    r: int = dataclasses.field(metadata=dict(static=True))
    distill_token: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def out_tokens(self) -> int:
        return self.n - self.r


def _effective_r(n: int, r: int, class_token: bool, distill_token: bool) -> int:
    protected = int(class_token) + int(distill_token)
    return max(0, min(int(r), (n - protected) // 2))


def _scores(
    metric: jax.Array,
    mode: str,
    class_token: bool,
    distill_token: bool,
    rng: Optional[jax.Array],
) -> jax.Array:
    """[B, ta, tb] matching scores between the even (A) and odd (B) sets."""
    b, n, _ = metric.shape
    ta, tb = n - n // 2, n // 2
    if mode.startswith("random"):
        if rng is None:
            raise ValueError(f"mode={mode!r} requires an rng key")
        scores = jax.random.uniform(rng, (b, ta, tb), dtype=jnp.float32)
    else:
        m = metric.astype(jnp.float32)
        m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
        a, bm = m[:, ::2, :], m[:, 1::2, :]
        # HIGHEST precision: on TPU the default bf16 matmul perturbs
        # near-tied similarity scores enough to flip merge decisions vs
        # the fp32 reference; decisions must be made in full fp32.
        scores = jax.lax.dot_general(
            a,
            bm,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if class_token:
        scores = scores.at[:, 0, :].set(-jnp.inf)
    if distill_token:
        scores = scores.at[:, :, 0].set(-jnp.inf)
    return scores


def _match(
    metric: jax.Array,
    r: int,
    class_token: bool,
    distill_token: bool,
    mode: str,
    rng: Optional[jax.Array],
) -> Optional[Matching]:
    n = metric.shape[1]
    r = _effective_r(n, r, class_token, distill_token)
    if r <= 0:
        return None

    scores = _scores(metric, mode, class_token, distill_token, rng)
    node_max = jnp.max(scores, axis=-1)  # [B, ta]
    node_idx = jnp.argmax(scores, axis=-1)  # [B, ta]
    # Descending sort of per-src best scores; stable so ties resolve to
    # the lower src index (torch's sort is unstable here — decisions can
    # differ on exact ties, which is acceptable per-distribution parity).
    edge_idx = jnp.argsort(-node_max, axis=-1)
    src_idx = edge_idx[:, :r]
    unm_idx = edge_idx[:, r:]
    if class_token:
        unm_idx = jnp.sort(unm_idx, axis=-1)
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)
    src_score = jnp.take_along_axis(node_max, src_idx, axis=-1)
    return Matching(
        unm_idx=unm_idx,
        src_idx=src_idx,
        dst_idx=dst_idx,
        src_score=src_score,
        n=n,
        r=r,
        distill_token=distill_token,
    )


def bipartite_soft_matching(
    metric: jax.Array,
    r: int,
    class_token: bool = False,
    distill_token: bool = False,
    mode: str = "merge",
    rng: Optional[jax.Array] = None,
) -> Optional[Matching]:
    """ToMe matching with a balanced (even/odd) split.

    Reference: tome/merge.py:17-102. ``mode`` is 'merge' (cosine
    similarity) or 'random_merge' (uniform scores). Returns None when
    the clamped r is zero (identity — reference's ``do_nothing``).
    """
    if mode not in ("merge", "random_merge"):
        raise ValueError(f"unsupported mode {mode!r}")
    return _match(metric, r, class_token, distill_token, mode, rng)


def bipartite_soft_matching_drop(
    metric: jax.Array,
    r: int,
    class_token: bool = False,
    distill_token: bool = False,
    mode: str = "drop",
    rng: Optional[jax.Array] = None,
) -> Optional[Matching]:
    """Same matching, but the top-r srcs will be discarded, not merged.

    Reference: tome/merge.py:215-271. Apply with :func:`drop`.
    """
    if mode not in ("drop", "random_drop"):
        raise ValueError(f"unsupported mode {mode!r}")
    return _match(metric, r, class_token, distill_token, mode, rng)


def bipartite_soft_matching_hybrid(
    metric: jax.Array,
    r: int,
    class_token: bool = False,
    distill_token: bool = False,
    mode: str = "merge",
    threshold: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> Optional[Matching]:
    """Hybrid drop+merge matching (reference: tome/merge.py:274-352).

    The matching itself is identical to :func:`bipartite_soft_matching`;
    the thresholded dst-zeroing happens in :func:`merge` via
    ``threshold=``. This function exists for API parity.
    """
    del threshold  # applied at merge time
    if mode not in ("merge", "random_merge", "hybrid"):
        raise ValueError(f"unsupported mode {mode!r}")
    score_mode = "random_merge" if mode == "random_merge" else "merge"
    return _match(metric, r, class_token, distill_token, score_mode, rng)


def _batch_index(idx: jax.Array) -> jax.Array:
    return jnp.arange(idx.shape[0])[:, None]


def _gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather token rows: x [B, N, C], idx [B, K] -> [B, K, C]."""
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def _one_hot(idx: jax.Array, depth: int, dtype) -> jax.Array:
    """[B, r] int -> [B, r, depth] one-hot (vectorized compare; feeds
    the MXU instead of a scatter)."""
    iota = jnp.arange(depth, dtype=idx.dtype)
    return (idx[:, :, None] == iota[None, None, :]).astype(dtype)


def _scatter_sum_mm(dst: jax.Array, dst_idx: jax.Array, src: jax.Array) -> jax.Array:
    """Segment-sum via one-hot matmul.

    TPU-first: XLA lowers batched scatter-add with duplicate indices to
    a serialized loop on TPU; an [r, tb] one-hot contraction runs on the
    MXU instead (r,tb ~ hundreds: sub-millisecond). fp32 accumulation.
    """
    oh = _one_hot(dst_idx, dst.shape[1], src.dtype)  # [B, r, tb]
    add = jax.lax.dot_general(
        oh,
        src,
        (((1,), (1,)), ((0,), (0,))),  # [B, tb, C]
        preferred_element_type=jnp.float32,
    )
    return dst + add.astype(dst.dtype)


def _scatter(dst: jax.Array, dst_idx: jax.Array, src: jax.Array, mode: str) -> jax.Array:
    """Scatter-reduce ``src`` [B, r, C] into ``dst`` [B, tb, C] rows at
    ``dst_idx`` [B, r], including the original dst value in the
    reduction (torch ``scatter_reduce(include_self=True)`` semantics)."""
    if mode == "sum":
        return _scatter_sum_mm(dst, dst_idx, src)
    b = _batch_index(dst_idx)
    if mode in ("max", "amax"):
        return dst.at[b, dst_idx].max(src)
    if mode == "prod":
        return dst.at[b, dst_idx].multiply(src)
    if mode == "mean":
        sums = jnp.zeros_like(dst).at[b, dst_idx].add(src)
        cnt = jnp.zeros(dst.shape[:2] + (1,), dst.dtype).at[b, dst_idx].add(1.0)
        return (dst + sums) / (1.0 + cnt)
    raise ValueError(f"unsupported reduce mode {mode!r}")


def merge(
    m: Optional[Matching],
    x: jax.Array,
    mode: str = "mean",
    threshold: Optional[float] = None,
) -> jax.Array:
    """Apply a matching: [B, n, C] -> [B, n - r, C].

    ``threshold`` enables the hybrid semantics (reference:
    tome/merge.py:321-335): every dst that receives at least one merge
    edge with score < threshold is zeroed *before* the reduction, so the
    sub-threshold group is effectively dropped (its wavg size still
    counts the merged tokens, exactly like the reference).
    """
    if m is None:
        return x
    src, dst = x[:, ::2, :], x[:, 1::2, :]
    if threshold is not None:
        # hybrid: zero every dst that receives >=1 sub-threshold edge
        # (reference's scatter_reduce(prod) of the indicator,
        # merge.py:326-330) — expressed as a one-hot contraction so the
        # TPU path stays scatter-free.
        below = (m.src_score < threshold).astype(jnp.float32)  # [B, r]
        oh = _one_hot(m.dst_idx, dst.shape[1], jnp.float32)  # [B, r, tb]
        hits = jnp.einsum("brt,br->bt", oh, below)
        dst = dst * (hits == 0).astype(dst.dtype)[:, :, None]
    unm = _gather(src, m.unm_idx)
    src = _gather(src, m.src_idx)
    dst = _scatter(dst, m.dst_idx, src, mode)
    if m.distill_token:
        return jnp.concatenate([unm[:, :1], dst[:, :1], unm[:, 1:], dst[:, 1:]], axis=1)
    return jnp.concatenate([unm, dst], axis=1)


def unmerge(m: Optional[Matching], x: jax.Array) -> jax.Array:
    """Inverse layout of :func:`merge`: [B, n - r, C] -> [B, n, C],
    broadcasting each dst value back to its merged srcs
    (reference: tome/merge.py:87-100)."""
    if m is None:
        return x
    unm_len = m.unm_idx.shape[1]
    unm, dst = x[:, :unm_len, :], x[:, unm_len:, :]
    src = _gather(dst, m.dst_idx)
    b = _batch_index(m.unm_idx)
    out = jnp.zeros((x.shape[0], m.n, x.shape[-1]), x.dtype)
    out = out.at[:, 1::2, :].set(dst)
    out = out.at[b, 2 * m.unm_idx].set(unm)
    out = out.at[b, 2 * m.src_idx].set(src)
    return out


def drop(m: Optional[Matching], x: jax.Array) -> jax.Array:
    """Apply a drop matching: keep unmerged srcs + all dsts
    (reference: tome/merge.py:260-269)."""
    if m is None:
        return x
    src, dst = x[:, ::2, :], x[:, 1::2, :]
    und = _gather(src, m.unm_idx)
    if m.distill_token:
        return jnp.concatenate([und[:, :1], dst[:, :1], und[:, 1:], dst[:, 1:]], axis=1)
    return jnp.concatenate([und, dst], axis=1)


def merge_wavg(
    m: Optional[Matching],
    x: jax.Array,
    size: Optional[jax.Array] = None,
    threshold: Optional[float] = None,
):
    """Size-weighted merge (reference: tome/merge.py:355-369).

    Returns (x_merged, size_merged); ``size`` tracks how many original
    tokens each current token represents (used by proportional attn).

    HBM-minimal formulation (the merge step is bandwidth-bound on TPU):
    unmerged src rows are mathematically identity under the wavg
    ((x*size)/size), so they are plain row gathers — the mass
    multiply/divide runs only over the r merged rows and the dst half,
    and the division fuses into the one-hot contraction's consumer.
    Equivalent to the reference's merge(x*size)/merge(size) to fp
    rounding.
    """
    if size is None:
        size = jnp.ones(x.shape[:2] + (1,), jnp.float32)
    # sizes are token counts: keep them f32 (bf16 cannot represent
    # integers > 256 exactly, and max-merging rows reach ~1568)
    size = size.astype(jnp.float32)
    if m is None:
        return x, size
    src_x, dst_x = x[:, ::2, :], x[:, 1::2, :]
    src_s, dst_s = size[:, ::2, :], size[:, 1::2, :]

    # one permutation gather for [kept ∥ merged] src rows (fewer HBM
    # passes than separate unm/sel gathers)
    perm = jnp.concatenate([m.unm_idx, m.src_idx], axis=1)
    gx = _gather(src_x, perm)
    gs = _gather(src_s, perm)
    n_unm = m.unm_idx.shape[1]
    unm_x, sel_x = gx[:, :n_unm], gx[:, n_unm:]
    unm_s, sel_s = gs[:, :n_unm], gs[:, n_unm:]

    sel_mass = sel_x * sel_s.astype(x.dtype)

    oh_f = _one_hot(m.dst_idx, dst_x.shape[1], jnp.float32)  # [B, r, tb]
    if threshold is not None:
        # hybrid: zero every dst (mass AND size) that receives >=1
        # sub-threshold edge before the scatter-sum (reference
        # tome/merge.py:326-330 scatter_reduce(prod) of the indicator)
        below = (m.src_score < threshold).astype(jnp.float32)  # [B, r]
        hits = jnp.einsum("brt,br->bt", oh_f, below)
        keep = (hits == 0).astype(jnp.float32)[:, :, None]
        dst_x = dst_x * keep.astype(dst_x.dtype)
        dst_s = dst_s * keep

    args = (((1,), (1,)), ((0,), (0,)))  # contract r, batch B
    # mass: bf16 in/out with f32 MXU accumulation (one rounding at the
    # end); size: exact f32 (a [*, 1] column — negligible matvec)
    add_mass = jax.lax.dot_general(
        oh_f.astype(x.dtype), sel_mass, args, preferred_element_type=x.dtype
    )
    add_size = jax.lax.dot_general(
        oh_f, sel_s, args, preferred_element_type=jnp.float32
    )
    dst_size = dst_s + add_size
    dst_out = (
        dst_x * dst_s.astype(x.dtype) + add_mass
    ) / dst_size.astype(x.dtype)

    if m.distill_token:
        xm = jnp.concatenate(
            [unm_x[:, :1], dst_out[:, :1], unm_x[:, 1:], dst_out[:, 1:]], axis=1
        )
        sm = jnp.concatenate(
            [unm_s[:, :1], dst_size[:, :1], unm_s[:, 1:], dst_size[:, 1:]], axis=1
        )
        return xm, sm
    xm = jnp.concatenate([unm_x, dst_out], axis=1)
    sm = jnp.concatenate([unm_s, dst_size], axis=1)
    return xm, sm


def merge_source(
    m: Optional[Matching],
    x: jax.Array,
    source: Optional[jax.Array] = None,
    threshold: Optional[float] = None,
) -> jax.Array:
    """Track which original tokens constitute each merged group
    (reference: tome/merge.py:372-384). ``source`` is a [B, n_t, n_0]
    adjacency; initialised to identity on first call. ``threshold``
    applies the hybrid dst-zeroing so dropped groups show empty rows
    (reference hybrid merge closure used for source, tome/merge.py:321)."""
    if source is None:
        bsz, t, _ = x.shape
        source = jnp.broadcast_to(jnp.eye(t, dtype=x.dtype)[None], (bsz, t, t))
    return merge(m, source, mode="max", threshold=threshold)


def drop_source(
    m: Optional[Matching], x: jax.Array, source: Optional[jax.Array] = None
) -> jax.Array:
    """Source tracking for drop mode (reference: tome/patch/*.py
    videomae_drop:114-120 — drop applied to the eye-initialised source)."""
    if source is None:
        bsz, t, _ = x.shape
        source = jnp.broadcast_to(jnp.eye(t, dtype=x.dtype)[None], (bsz, t, t))
    return drop(m, source)


def kth_bipartite_soft_matching(metric: jax.Array, k: int):
    """Sets = (every k-th token as dst, the rest as src); n -> n/k.

    Reference: tome/merge.py:105-158. Returns (merge_fn, unmerge_fn)
    closures since its index layout differs from :class:`Matching`.
    """
    if k <= 1:
        return (lambda x, mode="mean": x), (lambda x: x)

    def split(x):
        t_rnd = (x.shape[1] // k) * k
        x = x[:, :t_rnd, :].reshape(x.shape[0], -1, k, x.shape[2])
        a = x[:, :, : k - 1, :].reshape(x.shape[0], -1, x.shape[-1])
        b = x[:, :, k - 1, :]
        return a, b

    m = metric.astype(jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    a, b = split(m)
    r = a.shape[1]
    scores = jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))), precision=jax.lax.Precision.HIGHEST
    )
    dst_idx = jnp.argmax(scores, axis=-1)  # [B, r]

    def merge_fn(x: jax.Array, mode: str = "mean") -> jax.Array:
        src, dst = split(x)
        return _scatter(dst, dst_idx, src, mode)

    def unmerge_fn(x: jax.Array) -> jax.Array:
        n, _, c = x.shape
        src = _gather(x, dst_idx).astype(x.dtype)
        src = src.reshape(n, -1, k - 1, c)
        dst = x.reshape(n, -1, 1, c)
        return jnp.concatenate([src, dst], axis=-2).reshape(n, -1, c)

    return merge_fn, unmerge_fn


def random_bipartite_soft_matching(metric: jax.Array, r: int, rng: jax.Array):
    """Sets = (r randomly chosen tokens as src, the rest as dst).

    Reference: tome/merge.py:161-212. Returns (merge_fn, unmerge_fn).
    """
    if r <= 0:
        return (lambda x, mode="mean": x), (lambda x: x)

    bsz, n, _ = metric.shape
    rand_idx = jnp.argsort(jax.random.uniform(rng, (bsz, n)), axis=1)
    a_idx, b_idx = rand_idx[:, :r], rand_idx[:, r:]

    def split(x):
        return _gather(x, a_idx), _gather(x, b_idx)

    m = metric.astype(jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    a, b = split(m)
    scores = jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))), precision=jax.lax.Precision.HIGHEST
    )
    dst_idx = jnp.argmax(scores, axis=-1)

    def merge_fn(x: jax.Array, mode: str = "mean") -> jax.Array:
        src, dst = split(x)
        return _scatter(dst, dst_idx, src, mode)

    def unmerge_fn(x: jax.Array) -> jax.Array:
        src = _gather(x, dst_idx)
        bb = _batch_index(a_idx)
        out = jnp.zeros((bsz, n, x.shape[-1]), x.dtype)
        out = out.at[bb, a_idx].set(src)
        out = out.at[bb, b_idx].set(x)
        return out

    return merge_fn, unmerge_fn
