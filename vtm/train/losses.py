"""Loss functions (reference: slowfast/models/losses.py)."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    """labels may be int class ids or soft distributions (mixup)."""
    if labels.ndim == logits.ndim:
        return optax.softmax_cross_entropy(logits, labels).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def soft_target_cross_entropy(logits, soft_targets):
    return optax.softmax_cross_entropy(logits, soft_targets).mean()


def bce_logit(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


_LOSSES = {
    "cross_entropy": cross_entropy,
    "soft_cross_entropy": soft_target_cross_entropy,
    "bce_logit": bce_logit,
    "mse": mse,
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
