"""Training-step construction: loss + grad + optax update, data-parallel.

Replaces the reference's train_epoch inner loop mechanics
(tools/train_net.py:35-193): autocast -> bf16 module dtype; GradScaler
-> unnecessary (bf16 needs no loss scaling); DDP allreduce -> XLA psum
from sharded-batch/replicated-params jit; ACCUMULATE_STEPS -> optax
MultiSteps.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

from vtm.parallel.mesh import batch_sharding, replicated_sharding
from vtm.train import losses as loss_lib


def make_train_step(module, tx, loss_name: str, multi_head: bool, mesh=None,
                    param_specs=None):
    """``param_specs``: optional PartitionSpec pytree for the params
    (tensor parallelism — vtm/parallel/sharding.py); None = replicated.
    Gradients/optimizer state inherit the param shardings from jit's
    output propagation."""
    base_loss = loss_lib.get_loss_func(loss_name)

    def step(params, opt_state, frames, labels, rngs: Optional[jax.Array] = None):
        def loss_fn(p):
            logits, _ = module.apply({"params": p}, frames, rng=rngs)
            if multi_head:
                verb = base_loss(logits[0], labels["verb"])
                noun = base_loss(logits[1], labels["noun"])
                loss = 0.5 * (verb + noun)  # reference train_net.py:157-161
                return loss, (logits, (verb, noun))
            loss = base_loss(logits, labels)
            return loss, (logits, ())

        (loss, (logits, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, logits, aux

    if mesh is None:
        return jax.jit(step)
    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    label_shard = {"verb": dat, "noun": dat} if multi_head else dat
    if param_specs is None:
        return jax.jit(
            step,
            in_shardings=(rep, rep, dat, label_shard, rep),
            donate_argnums=(0, 1),
        )
    # tp: params follow their specs; the optimizer state mirrors the
    # param tree leaves, so let jit infer its sharding from the placed
    # arrays (None = use the argument's committed sharding)
    from jax.sharding import NamedSharding

    par = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs,
        is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec),
    )
    return jax.jit(
        step,
        in_shardings=(par, None, dat, label_shard, rep),
        donate_argnums=(0, 1),
    )


def make_eval_step(module, mesh=None, with_rng: bool = False, param_specs=None):
    """Jitted forward. ``with_rng=True`` adds a PRNG-key argument for the
    random merge/drop modes (the reference's torch.rand draws).
    ``param_specs``: tensor-parallel PartitionSpecs (else replicated)."""
    if with_rng:

        def step(params, frames, rng):
            logits, _ = module.apply({"params": params}, frames, rng=rng)
            return logits

    else:

        def step(params, frames):
            logits, _ = module.apply({"params": params}, frames)
            return logits

    if mesh is None:
        return jax.jit(step)
    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    if param_specs is None:
        par = rep
    else:
        from jax.sharding import NamedSharding

        par = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), param_specs,
            is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec),
        )
    shardings = (par, dat, rep) if with_rng else (par, dat)
    return jax.jit(step, in_shardings=shardings)
