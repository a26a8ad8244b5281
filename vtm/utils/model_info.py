"""Model statistics (reference: slowfast/utils/misc.py:80-199
`log_model_info` — fvcore flop/activation counting on dummy input).

TPU-native: FLOPs come from XLA's own cost analysis of the compiled
forward computation; params/bytes from the pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vtm.utils.logging import get_logger, log_json_stats

logger = get_logger(__name__)


def params_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def params_bytes(params) -> int:
    return sum(
        int(np.prod(p.shape)) * jnp.dtype(p.dtype).itemsize
        for p in jax.tree_util.tree_leaves(params)
    )


def flop_count(module, params, sample: jax.Array, batch_stats=None) -> float:
    """FLOPs of one forward pass from XLA cost analysis (analog of
    fvcore flop_count on a dummy input, misc.py:139)."""

    def fwd(p, v):
        variables = {"params": p}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return module.apply(variables, v)

    fn = jax.jit(fwd)
    compiled = fn.lower(params, sample).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0))


def device_memory_stats() -> dict:
    """HBM usage of device 0 (the reference's gpu_mem_usage/nvidia-smi
    analog, misc.py:55-78); empty when the backend doesn't report."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {
            "hbm_bytes_in_use": stats.get("bytes_in_use", 0),
            "hbm_bytes_limit": stats.get("bytes_limit", 0),
        }
    except Exception:
        return {}


def log_model_info(bundle, cfg, use_train_input: bool = False) -> dict:
    t = cfg.DATA.NUM_FRAMES
    s = cfg.DATA.TRAIN_CROP_SIZE if use_train_input else cfg.DATA.TEST_CROP_SIZE
    sample = jnp.zeros((1, t, s, s, 3), jnp.float32)
    flops = flop_count(bundle.module, bundle.params, sample, bundle.batch_stats)
    stats = {
        "model": bundle.name,
        "params": params_count(bundle.params),
        "param_bytes": params_bytes(bundle.params),
        "gflops_per_clip": round(flops / 1e9, 3),
        **device_memory_stats(),
    }
    log_json_stats({"split": "model_info", **stats}, logger)
    return stats
