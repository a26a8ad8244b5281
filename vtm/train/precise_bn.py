"""Precise-BN: recompute BN running statistics as a true average over
N loader batches before eval/checkpoint.

Reference: fvcore's update_bn_stats driven by
tools/train_net.py:572-593 + 879-891 (calculate_and_update_precise_bn,
BN.USE_PRECISE_STATS / BN.NUM_BATCHES_PRECISE). fvcore sets every BN
momentum to 1.0 (so the "running" stat after a forward IS that batch's
stat) and averages across batches; we do the same by cloning the module
with momentum=1 and averaging the mutated batch_stats trees.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _with_momentum_one(module):
    spec = module.spec
    norm = dataclasses.replace(spec.norm, momentum=1.0)
    return module.clone(spec=dataclasses.replace(spec, norm=norm))


# one jitted stats-forward per source module (keyed by identity; the
# tuple keeps the module alive so the id is never recycled) — a fresh
# jit closure per call recompiled the whole conv forward at EVERY
# precise-BN epoch
_JIT_CACHE: dict = {}


def _batch_stats_fn(module):
    hit = _JIT_CACHE.get(id(module))
    if hit is not None:
        return hit[1]
    m1 = _with_momentum_one(module)

    @jax.jit
    def batch_stats_of(p, bn, frames, rng):
        _, mutated = m1.apply(
            {"params": p, "batch_stats": bn}, frames, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        return mutated["batch_stats"]

    _JIT_CACHE[id(module)] = (module, batch_stats_of)
    return batch_stats_of


def compute_precise_bn_stats(
    module, params, batch_stats, loader, num_batches: int, rng=None
):
    """Returns batch_stats whose mean/var are the average of the
    per-batch statistics over ``num_batches`` batches of ``loader``."""
    rng = rng if rng is not None else jax.random.key(0)
    batch_stats_of = _batch_stats_fn(module)

    total = None
    seen = 0
    for batch in loader:
        frames = jnp.asarray(np.asarray(batch["frames"]))
        stats = batch_stats_of(params, batch_stats, frames, rng)
        total = (
            stats
            if total is None
            else jax.tree_util.tree_map(jnp.add, total, stats)
        )
        seen += 1
        if seen >= num_batches:
            break
    if total is None:
        return batch_stats
    return jax.tree_util.tree_map(lambda s: s / seen, total)
