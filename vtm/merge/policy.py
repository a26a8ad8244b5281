"""MergePolicy — merging as a first-class model component.

The reference wires ToMe in by monkey-patching module classes and a
mutable ``_tome_info`` dict (tome/patch/*.py). Here the policy is an
immutable, hashable spec passed to the model constructor; the per-layer
r schedule is resolved at build time (static shapes), and per-forward
state (token sizes, source adjacency, rng) is threaded functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vtm.merge import bipartite

MERGE_MODES = ("merge", "random_merge")
DROP_MODES = ("drop", "random_drop")
ALL_MODES = MERGE_MODES + DROP_MODES + ("hybrid", "none")


@dataclasses.dataclass(frozen=True)
class MergePolicy:
    """Static merging configuration for one model.

    Mirrors the reference ``apply_patch`` arguments + ``model.r``
    (e.g. tome/patch/vivit.py:226-247):
      mode: merge | random_merge | drop | random_drop | hybrid | none
      rs:   per-layer r values (use ``parse_r`` to expand an int/tuple)
      prop_attn: add log(size) to attention logits
      head_aggregation: 'mean' | 'concat' over heads for the metric
      threshold: hybrid dst-drop threshold
      trace_source: carry the [B, n_t, n_0] source adjacency (vis only)
    """

    rs: Tuple[int, ...] = ()
    mode: str = "none"
    prop_attn: bool = True
    head_aggregation: str = "mean"
    threshold: float = 0.0
    trace_source: bool = False
    class_token: bool = False
    distill_token: bool = False

    def __post_init__(self):
        if self.mode not in ALL_MODES:
            raise ValueError(f"unknown merge mode {self.mode!r}")
        object.__setattr__(self, "rs", tuple(int(r) for r in self.rs))

    @property
    def enabled(self) -> bool:
        return self.mode != "none" and any(r > 0 for r in self.rs)

    @property
    def needs_rng(self) -> bool:
        return self.mode in ("random_merge", "random_drop")

    def r_at(self, layer: int) -> int:
        if layer >= len(self.rs):
            return 0
        return self.rs[layer]

    def token_counts(self, n0: int) -> Tuple[int, ...]:
        """Token count entering each layer (len(rs)+1 entries)."""
        from vtm.merge.schedule import token_counts

        protected = int(self.class_token) + int(self.distill_token)
        if self.mode == "none":
            return tuple([n0] * (len(self.rs) + 1))
        return tuple(token_counts(n0, self.rs, protected))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MergeState:
    """Per-forward mutable companions of MergePolicy, threaded through
    the layer stack (reference ``_tome_info['size'/'source']``)."""

    size: Optional[jax.Array] = None  # [B, n, 1] token multiplicities
    source: Optional[jax.Array] = None  # [B, n, n0] adjacency (if traced)
    rng: Optional[jax.Array] = None  # PRNG key for random modes

    def next_rng(self) -> Optional[jax.Array]:
        if self.rng is None:
            return None
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def attn_size(self, prop_attn: bool) -> Optional[jax.Array]:
        return self.size if prop_attn else None


def reduce_tokens(
    policy: MergePolicy,
    layer: int,
    metric: jax.Array,
    x: jax.Array,
    state: MergeState,
) -> Tuple[jax.Array, MergeState]:
    """Apply the layer's token reduction: the functional equivalent of
    the reference per-model reduction functions (e.g.
    tome/patch/videomae.py:80-151 videomae_{merge,drop,hybrid}).

    ``metric`` is [B', n, Cm] and ``x`` is [B', n, C] where B' may be a
    folded (batch*frames) axis for per-frame models. Returns the reduced
    x (n - r tokens, statically) and the updated state.
    """
    r = policy.r_at(layer)
    if policy.mode == "none" or r <= 0:
        return x, state

    rng = state.next_rng() if policy.needs_rng else None

    if policy.mode in MERGE_MODES:
        m = bipartite.bipartite_soft_matching(
            metric, r, policy.class_token, policy.distill_token, policy.mode, rng
        )
        if policy.trace_source:
            state.source = bipartite.merge_source(m, x, state.source)
        x, state.size = bipartite.merge_wavg(m, x, state.size)
        return x, state

    if policy.mode in DROP_MODES:
        m = bipartite.bipartite_soft_matching_drop(
            metric, r, policy.class_token, policy.distill_token, policy.mode, rng
        )
        if policy.trace_source:
            state.source = bipartite.drop_source(m, x, state.source)
        x = bipartite.drop(m, x)
        state.size = jnp.ones_like(x[..., :1])
        return x, state

    # hybrid
    m = bipartite.bipartite_soft_matching_hybrid(
        metric, r, policy.class_token, policy.distill_token, "merge", policy.threshold, rng
    )
    if policy.trace_source:
        state.source = bipartite.merge_source(m, x, state.source, threshold=policy.threshold)
    x, state.size = bipartite.merge_wavg(m, x, state.size, threshold=policy.threshold)
    return x, state
