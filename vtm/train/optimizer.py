"""Optimizer construction with optax
(reference: slowfast/models/optimizer.py:11-255, 269-360).

Replicates the reference's param grouping faithfully:

  * BN params form their own group with ``BN.WEIGHT_DECAY`` and are
    never LARS-adapted (optimizer.py:44,60-65);
  * the model's ``no_weight_decay()`` name set gets wd=0 — only
    Motionformer / MViT / masked models define one (motionformer
    builder:174-178, video_model_builder.py:1115-1136); the ViT
    families (VideoMAE/TimeSformer/ViViT) do NOT, so their pos/cls
    embeddings ARE decayed, matching the reference;
  * 1-D params / ``.bias`` get wd=0 only when
    ``SOLVER.ZERO_WD_1D_PARAM`` (optimizer.py:52-55, 196);
  * ``SOLVER.LAYER_DECAY`` < 1 builds per-block LR multipliers
    (get_param_groups:151-245, used by the VideoMAE EPIC finetune).

``SOLVER.LARS_ON`` wraps the step like the reference LARS class
(optimizer.py:269-360, wired at :144-148 with trust_coefficient=0.001,
clip=False): for every LARS-applied non-1-D param with nonzero param
and grad norms, the grad becomes
``(g + wd * p) * trust * |p| / (|g| + |p| * wd + eps)`` and the inner
optimizer then runs with that group's weight decay DISABLED (so 1-D /
zero-norm params silently get no decay during LARS steps — a
reference quirk preserved here).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import optax

from vtm.train.lr_policy import get_lr_at_epoch


def _path_name(path: tuple) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _is_bn(path: tuple) -> bool:
    """BatchNorm params (conv families): any path segment named *bn
    ('bn', 'a_bn', 'b_bn', 'c_bn', sub-BN splits)."""
    return any(
        str(getattr(p, "key", p)).endswith("bn") for p in path
    )


def _skip_names(cfg) -> tuple:
    """The model's no_weight_decay() name set (substring match on the
    flax path). Only the models that define one in the reference."""
    name = getattr(cfg.MODEL, "MODEL_NAME", "").lower()
    if name == "motionformer":
        return ("pos_embed", "cls_token", "st_embed", "temp_embed")
    if name in ("mvit", "maskmvit") and cfg.MVIT.ZERO_DECAY_POS_CLS:
        return (
            "pos_embed",
            "pos_embed_spatial",
            "pos_embed_temporal",
            "pos_embed_class",
            "rel_pos_h",
            "rel_pos_w",
            "rel_pos_t",
            "cls_token",
            "mask_token",
        )
    return ()


def _is_zero_wd(cfg, path: tuple, leaf) -> bool:
    name = _path_name(path)
    if any(k in name for k in _skip_names(cfg)):
        return True
    if cfg.SOLVER.ZERO_WD_1D_PARAM and (
        (hasattr(leaf, "ndim") and leaf.ndim <= 1) or name.endswith("bias")
    ):
        return True
    return False


def _layer_id(path: tuple, num_layers: int) -> int:
    """Param path -> layer index for layer decay (reference
    get_param_groups): embeddings -> 0, block i -> i+1, head -> L+1."""
    name = _path_name(path)
    m = re.search(r"(?:blocks|layer)_(\d+)", name)
    if m:
        return int(m.group(1)) + 1
    if any(k in name for k in ("patch_embed", "cls_token", "position_embeddings", "pos_embed")):
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


def _masked_decay(wd_tree) -> optax.GradientTransformation:
    """add_decayed_weights with a PER-LEAF static decay value."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("masked decay needs params")
        return (
            jax.tree_util.tree_map(
                lambda u, p, w: u + w * p if w else u, updates, params, wd_tree
            ),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def _lars(
    wd_tree,
    apply_tree,
    trust_coefficient: float = 0.001,
    clip: bool = False,
    eps: float = 1e-8,
    lr=None,
) -> optax.GradientTransformation:
    """Reference LARS (slowfast/models/optimizer.py:269-360) as a grad
    transform: per applied non-1-D leaf with nonzero norms,
    g <- (g + wd*p) * adaptive_lr. 1-D params and zero-norm params pass
    through UNmodified (and get no decay — reference quirk)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("LARS needs params")

        def f(g, p, wd, ap):
            if not ap or p.ndim <= 1:
                return g
            pn = jnp.linalg.norm(p.astype(jnp.float32))
            gn = jnp.linalg.norm(g.astype(jnp.float32))
            al = trust_coefficient * pn / (gn + pn * wd + eps)
            if clip and lr is not None:
                al = jnp.minimum(al / lr, 1.0)
            cond = jnp.logical_and(pn != 0.0, gn != 0.0)
            return jnp.where(cond, (g + wd * p) * al.astype(g.dtype), g)

        return (
            jax.tree_util.tree_map(f, updates, params, wd_tree, apply_tree),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def construct_optimizer(cfg, params, num_layers: int = 12):
    """Returns (optax transform with injected `learning_rate`,
    lr_at(epoch_exact) fn). Update the lr each step via
    ``opt_state.hyperparams['learning_rate']``."""
    method = cfg.SOLVER.OPTIMIZING_METHOD
    wd = cfg.SOLVER.WEIGHT_DECAY
    bn_wd = cfg.BN.WEIGHT_DECAY
    lars_on = bool(getattr(cfg.SOLVER, "LARS_ON", False))

    # per-leaf static metadata (reference grouping)
    bn_tree = jax.tree_util.tree_map_with_path(
        lambda p, x: _is_bn(p), params
    )
    wd_tree = jax.tree_util.tree_map_with_path(
        lambda p, x: (
            bn_wd if _is_bn(p) else (0.0 if _is_zero_wd(cfg, p, x) else wd)
        ),
        params,
    )
    # LARS applies to non-BN groups only (reference: apply_LARS=False
    # on the BN group, optimizer.py:64)
    lars_tree = jax.tree_util.tree_map(lambda is_bn: not is_bn, bn_tree)

    ld = cfg.SOLVER.LAYER_DECAY
    ld_scales = None
    if ld < 1.0:
        ld_scales = jax.tree_util.tree_map_with_path(
            lambda p, x: ld ** (num_layers + 1 - _layer_id(p, num_layers)), params
        )

    # decoupled/in-grad decay trees for the inner optimizer: under LARS
    # the non-BN groups' decay moves into the LARS grad rewrite and the
    # inner step sees decay only for the BN group (optimizer.py:332-336,
    # 368-370)
    inner_wd_tree = (
        jax.tree_util.tree_map(
            lambda w, is_bn: w if is_bn else 0.0, wd_tree, bn_tree
        )
        if lars_on
        else wd_tree
    )

    @optax.inject_hyperparams
    def make(learning_rate):
        parts = []
        if cfg.SOLVER.CLIP_GRAD_L2NORM:
            parts.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRAD_L2NORM))
        elif cfg.SOLVER.CLIP_GRAD_VAL:
            parts.append(optax.clip(cfg.SOLVER.CLIP_GRAD_VAL))
        if lars_on:
            parts.append(
                _lars(wd_tree, lars_tree, trust_coefficient=0.001, clip=False)
            )
        if method == "sgd":
            parts += [
                _masked_decay(inner_wd_tree),
                optax.trace(
                    decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV
                ),
            ]
        elif method in ("adamw", "mt_adamw"):
            parts += [
                optax.scale_by_adam(
                    b1=cfg.SOLVER.BETAS[0], b2=cfg.SOLVER.BETAS[1], eps=1e-8
                ),
                _masked_decay(inner_wd_tree),
            ]
        elif method == "adam":
            # torch.optim.Adam: L2 folded into the grad BEFORE the
            # adaptive update (unlike AdamW's decoupled decay)
            parts += [
                _masked_decay(inner_wd_tree),
                optax.scale_by_adam(
                    b1=cfg.SOLVER.BETAS[0], b2=cfg.SOLVER.BETAS[1], eps=1e-8
                ),
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
