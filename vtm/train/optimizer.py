"""Optimizer construction with optax
(reference: slowfast/models/optimizer.py:11-255).

Replicates the reference's param grouping: no weight decay for 1-D
params / embeddings (optimizer.py grouping rules) and optional
layer-decay — per-block LR multipliers used by the VideoMAE EPIC
finetune (`SOLVER.LAYER_DECAY`, optimizer.py:151-245). The learning
rate is an injected hyperparam updated every step, preserving the
reference's epoch-exact schedule (train_net.py:114-116).
"""

from __future__ import annotations

import re

import jax
import optax

from vtm.train.lr_policy import get_lr_at_epoch


def _is_no_decay(path: tuple, leaf) -> bool:
    name = "/".join(str(getattr(p, "key", p)) for p in path)
    if hasattr(leaf, "ndim") and leaf.ndim <= 1:
        return True  # biases, norm scales, 1-D gammas
    return any(k in name for k in ("pos_embed", "cls_token", "position_embeddings"))


def _layer_id(path: tuple, num_layers: int) -> int:
    """Param path -> layer index for layer decay (reference
    get_param_groups): embeddings -> 0, block i -> i+1, head -> L+1."""
    name = "/".join(str(getattr(p, "key", p)) for p in path)
    m = re.search(r"(?:blocks|layer)_(\d+)", name)
    if m:
        return int(m.group(1)) + 1
    if any(k in name for k in ("patch_embed", "cls_token", "position_embeddings")):
        return 0
    return num_layers + 1


def _tree_scale(scales) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def construct_optimizer(cfg, params, num_layers: int = 12):
    """Returns (optax transform with injected `learning_rate`,
    lr_at(epoch_exact) fn). Update the lr each step via
    ``opt_state.hyperparams['learning_rate']``."""
    method = cfg.SOLVER.OPTIMIZING_METHOD
    wd = cfg.SOLVER.WEIGHT_DECAY

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda p, x: not _is_no_decay(p, x), params
    )
    ld = cfg.SOLVER.LAYER_DECAY
    ld_scales = None
    if ld < 1.0:
        ld_scales = jax.tree_util.tree_map_with_path(
            lambda p, x: ld ** (num_layers + 1 - _layer_id(p, num_layers)), params
        )

    @optax.inject_hyperparams
    def make(learning_rate):
        parts = []
        if cfg.SOLVER.CLIP_GRAD_L2NORM:
            parts.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRAD_L2NORM))
        elif cfg.SOLVER.CLIP_GRAD_VAL:
            parts.append(optax.clip(cfg.SOLVER.CLIP_GRAD_VAL))
        if method == "sgd":
            parts += [
                optax.add_decayed_weights(wd, mask=decay_mask),
                optax.trace(
                    decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV
                ),
            ]
        elif method in ("adamw", "mt_adamw"):
            parts += [
                optax.scale_by_adam(
                    b1=cfg.SOLVER.BETAS[0], b2=cfg.SOLVER.BETAS[1], eps=1e-8
                ),
                optax.add_decayed_weights(wd, mask=decay_mask),
            ]
        elif method == "adam":
            parts += [
                optax.scale_by_adam(
                    b1=cfg.SOLVER.BETAS[0], b2=cfg.SOLVER.BETAS[1], eps=1e-8
                )
            ]
        else:
            raise NotImplementedError(f"optimizer {method!r} not supported")
        if ld_scales is not None:
            parts.append(_tree_scale(ld_scales))
        parts.append(optax.scale(-learning_rate))
        return optax.chain(*parts)

    def lr_at(epoch_exact: float) -> float:
        return get_lr_at_epoch(cfg, epoch_exact)

    return make(learning_rate=lr_at(0.0)), lr_at


def set_lr(opt_state, lr: float):
    """Update the injected learning rate in-place-style (returns state).
    Sees through optax.MultiSteps (SOLVER.ACCUMULATE_STEPS > 1), whose
    wrapper state keeps the inject_hyperparams state at
    ``inner_opt_state``."""
    import jax.numpy as jnp

    target = opt_state
    while not hasattr(target, "hyperparams") and hasattr(
        target, "inner_opt_state"
    ):
        target = target.inner_opt_state
    target.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
