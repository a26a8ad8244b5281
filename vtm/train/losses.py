"""Loss functions (reference: slowfast/models/losses.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    """labels may be int class ids or soft distributions (mixup)."""
    if labels.ndim == logits.ndim:
        return optax.softmax_cross_entropy(logits, labels).mean()
    if label_smoothing > 0.0:
        n = logits.shape[-1]
        soft = (
            jax.nn.one_hot(labels, n) * (1.0 - label_smoothing)
            + label_smoothing / n
        )
        return optax.softmax_cross_entropy(logits, soft).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def soft_target_cross_entropy(logits, soft_targets):
    return optax.softmax_cross_entropy(logits, soft_targets).mean()


def bce_logit(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def multiple_mse(preds, labels_and_weights, masks=None):
    """Weighted sum of per-depth mse losses (reference losses.py
    MultipleMSELoss:28-62). ``masks``: optional per-depth [B, N] bool —
    the TPU-native replacement for the reference's x[mask] row
    selection: the mse averages over masked positions only."""
    loss_sum = 0.0
    multi = []
    for i, (pred, lw) in enumerate(zip(preds, labels_and_weights)):
        if isinstance(lw, (tuple, list)):
            label, weight = lw[0], lw[1]
        else:
            label, weight = lw, 1.0
        if masks is not None:
            m = masks[i].astype(jnp.float32)[..., None]
            per = ((pred - label) ** 2) * m
            loss = per.sum() / jnp.maximum(m.sum() * pred.shape[-1], 1.0)
        else:
            loss = jnp.mean((pred - label) ** 2)
        loss_sum = loss_sum + loss * weight
        multi.append(loss)
    return loss_sum, multi


_LOSSES = {
    "cross_entropy": cross_entropy,
    "soft_cross_entropy": soft_target_cross_entropy,
    "bce_logit": bce_logit,
    "mse": mse,
    "multi_mse": multiple_mse,
}


def get_loss_func(name: str):
    if name not in _LOSSES:
        raise NotImplementedError(f"Loss {name!r} not supported")
    return _LOSSES[name]


def epic_dual_loss(loss_fn, logits_pair, labels):
    """0.5*(verb + noun) (reference tools/train_net.py:157-161)."""
    verb_logits, noun_logits = logits_pair
    return 0.5 * (
        loss_fn(verb_logits, labels["verb"]) + loss_fn(noun_logits, labels["noun"])
    )
