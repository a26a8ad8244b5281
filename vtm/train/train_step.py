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
import jax.numpy as jnp
from vtm.train import losses as loss_lib


def make_train_step(module, tx, loss_name: str, multi_head: bool, mesh=None,
                    param_specs=None, has_batch_stats: bool = False):
    """``param_specs``: optional PartitionSpec pytree for the params
    (tensor parallelism — vtm/parallel/sharding.py); None = replicated.
    Gradients/optimizer state inherit the param shardings from jit's
    output propagation.

    ``has_batch_stats=True`` (BN conv families): the step takes and
    returns the flax batch_stats collection — the BN running-stat
    update of the reference's forward pass. Under a jitted
    data-parallel mesh the statistics are computed over the GLOBAL
    batch (sync-BN semantics)."""
    base_loss = loss_lib.get_loss_func(loss_name)

    # conv/MViT modules take a `train` flag (BN/dropout/droppath and the
    # eval-only head activation); the ToMe transformer modules do not
    import inspect

    accepts_train = "train" in inspect.signature(module.__call__).parameters

    def _loss(p, bn, frames, labels, rngs):
        variables = {"params": p}
        drop_rng = {"dropout": rngs if rngs is not None else jax.random.key(0)}
        if bn is not None:
            variables["batch_stats"] = bn
            (logits, _), mutated = module.apply(
                variables, frames, rng=rngs, train=True,
                mutable=["batch_stats"], rngs=drop_rng,
            )
            new_bn = mutated["batch_stats"]
        elif accepts_train:
            logits, _ = module.apply(
                variables, frames, rng=rngs, train=True, rngs=drop_rng
            )
            new_bn = None
        else:
            logits, _ = module.apply(variables, frames, rng=rngs)
            new_bn = None
        if multi_head:
            verb = base_loss(logits[0], labels["verb"])
            noun = base_loss(logits[1], labels["noun"])
            loss = 0.5 * (verb + noun)  # reference train_net.py:157-161
            return loss, (logits, (verb, noun), new_bn)
        loss = base_loss(logits, labels)
        return loss, (logits, (), new_bn)

    if has_batch_stats:

        def step(params, bn, opt_state, frames, labels, rngs: Optional[jax.Array] = None):
            (loss, (logits, aux, new_bn)), grads = jax.value_and_grad(
                _loss, has_aux=True
            )(params, bn, frames, labels, rngs)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bn, new_opt_state, loss, logits, aux

    else:

        def step(params, opt_state, frames, labels, rngs: Optional[jax.Array] = None):
            (loss, (logits, aux, _)), grads = jax.value_and_grad(
                _loss, has_aux=True
            )(params, None, frames, labels, rngs)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, loss, logits, aux

    if mesh is None:
        return jax.jit(step)
    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    label_shard = {"verb": dat, "noun": dat} if multi_head else dat
    if has_batch_stats:
        assert param_specs is None, "tp not wired for BN conv families"
        return jax.jit(
            step,
            in_shardings=(rep, rep, rep, dat, label_shard, rep),
            donate_argnums=(0, 1, 2),
        )
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


def make_eval_step(module, mesh=None, with_rng: bool = False, param_specs=None,
                   batch_stats=None):
    """Jitted forward. ``with_rng=True`` adds a PRNG-key argument for the
    random merge/drop modes (the reference's torch.rand draws).
    ``param_specs``: tensor-parallel PartitionSpecs (else replicated).
    ``batch_stats``: BN running stats for the conv families — closed
    over (read-only at eval; a few hundred KB, far below the remote
    compiler's constant limit)."""

    def _vars(params):
        if batch_stats is None:
            return {"params": params}
        return {"params": params, "batch_stats": batch_stats}

    if with_rng:

        def step(params, frames, rng):
            logits, _ = module.apply(_vars(params), frames, rng=rng)
            return logits

    else:

        def step(params, frames):
            logits, _ = module.apply(_vars(params), frames)
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


def make_bn_eval_step(module, mesh=None):
    """Jitted eval forward for the BN conv families: the running stats
    are a step ARGUMENT (they evolve during training, so baking them in
    as constants would recompile every eval epoch)."""

    def step(params, batch_stats, frames):
        logits, _ = module.apply(
            {"params": params, "batch_stats": batch_stats}, frames
        )
        return logits

    if mesh is None:
        return jax.jit(step)
    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, rep, dat))


def make_detection_eval_step(module, batch_stats=None, mesh=None):
    """Jitted detection forward: (params[, batch_stats], frames, boxes)
    -> per-box class scores. Boxes are a padded [N, 5] array
    (batch_idx, x1, y1, x2, y2); the driver trims padded rows."""

    def step(params, bn, frames, boxes):
        variables = {"params": params}
        if bn is not None:
            variables["batch_stats"] = bn
        logits, _ = module.apply(variables, frames, bboxes=boxes)
        return logits

    jitted = jax.jit(step)

    # batch_stats is a traced ARGUMENT of the jitted step, so fresher
    # BN stats can be passed per call without recompiling — build this
    # step once, not per eval (each make_* call is a fresh jit cache)
    def run(params, frames, boxes, batch_stats=batch_stats):
        return jitted(params, batch_stats, frames, boxes)

    return run


def make_detection_train_step(module, tx, loss_name: str,
                              has_batch_stats: bool = True):
    """AVA detection training step (reference train_net.py:141 —
    ``preds = model(inputs, meta["boxes"])`` + bce on per-box labels).

    Boxes/labels are padded to a bucketed static count; ``weights``
    zeroes the padded rows out of the loss. Single-device jit (AVA
    boxes reference batch indices, which do not shard cleanly)."""
    base_loss = loss_lib.get_loss_func(loss_name)

    def step(params, bn, opt_state, frames, boxes, labels, weights, rngs):
        def loss_fn(p):
            variables = {"params": p}
            drop_rng = {"dropout": rngs}
            if bn is not None:
                variables["batch_stats"] = bn
                (logits, _), mutated = module.apply(
                    variables, frames, train=True, bboxes=boxes,
                    mutable=["batch_stats"], rngs=drop_rng,
                )
                new_bn = mutated["batch_stats"]
            else:
                logits, _ = module.apply(
                    variables, frames, train=True, bboxes=boxes, rngs=drop_rng
                )
                new_bn = None
            # per-box loss, padded rows weighted out
            import optax as _optax

            if loss_name == "bce_logit":
                per = _optax.sigmoid_binary_cross_entropy(
                    logits, labels
                ).mean(axis=-1)
            else:
                per_fn = lambda lg, lb: base_loss(lg[None], lb[None])
                per = jax.vmap(per_fn)(logits, labels)
            loss = (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)
            return loss, (logits, new_bn)

        import jax.numpy as jnp  # noqa: F811

        (loss, (logits, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bn, new_opt_state, loss, logits

    return jax.jit(step)


def make_mae_train_step(module, tx):
    """MAE pretraining step (MASK.MAE_ON): the model returns
    (full-grid preds, in-graph pixel labels, binary masks); the loss is
    the mask-weighted mse over dropped positions — the static-shape
    equivalent of the reference's x[mask] selection + MSE
    (reference masked.py _mae_forward:470-503)."""
    from vtm.train.losses import multiple_mse

    def step(params, opt_state, frames, mask, rngs):
        def loss_fn(p):
            preds, labels, out_masks = module.apply(
                {"params": p}, frames, mask, train=True,
                rngs={"dropout": rngs, "mask": rngs},
            )
            loss, multi = multiple_mse(
                preds,
                [(l, 1.0 / len(labels)) for l in labels],
                out_masks,
            )
            return loss, multi

        (loss, multi), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, multi

    return jax.jit(step)


def make_maskfeat_train_step(module, tx):
    """MaskFeat pretraining step (reference train_net.py:142-143 —
    ``preds, labels = model(inputs)`` + MultipleMSELoss).

    HOG labels are computed HOST-side in numpy (no gradients flow
    through them); the step takes (frames, mask, per-depth labels) and
    applies the masked weighted mse (vtm/train/losses.py multiple_mse)
    over ALL positions with mask weights — the static-shape equivalent
    of the reference's x[mask] row selection."""
    from vtm.train.losses import multiple_mse

    def step(params, opt_state, frames, mask, labels, rngs):
        def loss_fn(p):
            preds, out_masks = module.apply(
                {"params": p}, frames, mask, train=True,
                rngs={"dropout": rngs},
            )
            loss, multi = multiple_mse(
                preds, [(l, 1.0) for l in labels], out_masks
            )
            return loss, multi

        (loss, multi), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, multi

    return jax.jit(step)


def make_contrastive_train_step(model, tx, has_batch_stats: bool = False):
    """SSL train step for the functional ContrastiveModel
    (vtm/models/contrastive.py). ``all_params`` = {'backbone': ...,
    ['swav_prototypes': ...]}; the SwAV prototype weight is re-normalised
    BEFORE the forward outside the grad tape — the reference's no-grad
    in-place weight copy (contrastive.py:617-621) — and its gradients
    are gated off during the first epoch (contrastive_parameter_surgery).
    ``update_param=False`` (moco queue warm-up iterations,
    contrastive.py:1092-1110) skips the optimizer entirely while the
    queue/state still advance."""
    from vtm.models.contrastive import (
        normalize_swav_prototypes,
        swav_protos_grad_gate,
    )

    def step(all_params, bn, state, opt_state, clips, index, epoch_exact,
             rng, update_param: bool = True):
        if "swav_prototypes" in all_params:
            all_params = dict(all_params)
            all_params["swav_prototypes"] = normalize_swav_prototypes(
                jax.tree.map(jax.lax.stop_gradient,
                             all_params["swav_prototypes"])
            )

        def loss_fn(ap):
            logits, loss, aux = model.forward_train(
                ap["backbone"], bn, state, clips, index,
                epoch_exact=epoch_exact, rng=rng,
                proto_params=ap.get("swav_prototypes"),
            )
            return loss, (logits, aux)

        (loss, (logits, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(all_params)
        if "swav_prototypes" in grads:
            grads = dict(grads)
            grads["swav_prototypes"] = swav_protos_grad_gate(
                grads["swav_prototypes"], epoch_exact
            )
        if update_param:
            updates, new_opt_state = tx.update(grads, opt_state, all_params)
            new_params = optax.apply_updates(all_params, updates)
        else:
            new_params, new_opt_state = all_params, opt_state
        return (
            new_params,
            aux["new_bn"],
            aux["new_state"],
            new_opt_state,
            loss,
            logits,
        )

    return jax.jit(step, static_argnames=("update_param",))
