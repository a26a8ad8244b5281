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


def compute_precise_bn_stats(
    module, params, batch_stats, loader, num_batches: int, rng=None
):
    """Returns batch_stats whose mean/var are the average of the
    per-batch statistics over ``num_batches`` batches of ``loader``."""
    m1 = _with_momentum_one(module)
    rng = rng if rng is not None else jax.random.key(0)

    @jax.jit
    def batch_stats_of(p, bn, frames):
        _, mutated = m1.apply(
            {"params": p, "batch_stats": bn}, frames, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        return mutated["batch_stats"]

    total = None
    seen = 0
    for batch in loader:
        frames = jnp.asarray(np.asarray(batch["frames"]))
        stats = batch_stats_of(params, batch_stats, frames)
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
