"""Weights & Biases opt-in (reference: WANDB.ENABLE/PROJECT keys,
custom_config.py:134-140; init/log/finish calls in test_net.py:332-335,
meters.py:430-432, model_benchmark.py:52-56). Degrades to a no-op when
the wandb package is unavailable (it is not part of the TPU image)."""

from __future__ import annotations

from vtm.utils.logging import get_logger

logger = get_logger(__name__)

try:  # pragma: no cover - wandb not in the image
    import wandb as _wandb
except ImportError:
    _wandb = None

_active = False


def init(cfg) -> bool:
    """Start a run if WANDB.ENABLE and the package exists."""
    global _active
    if not cfg.WANDB.ENABLE:
        return False
    if _wandb is None:
        logger.warning("WANDB.ENABLE=True but wandb is not installed — skipping")
        return False
    _wandb.init(project=cfg.WANDB.PROJECT, config=cfg.dump() if hasattr(cfg, "dump") else None)
    _active = True
    return True


def log(stats: dict):
    if _active and _wandb is not None:
        _wandb.log(stats)


def finish():
    global _active
    if _active and _wandb is not None:
        _wandb.finish()
    _active = False
