"""Checkpoint save/restore (reference: slowfast/utils/checkpoint.py).

Two paths:
  * native training checkpoints via orbax (epoch, params, opt state,
    cfg dump) under ``<OUTPUT_DIR>/checkpoints/epoch_<N>`` — the analog
    of the reference's ``checkpoints/checkpoint_epoch_%05d.pyth``
    (:115-149) with max-epoch auto-resume (:61-79);
  * one-way import of torch checkpoints through vtm.checkpoints.convert
    (the reference's foreign-checkpoint fixups, :303-311).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np

from vtm.utils.logging import get_logger

logger = get_logger(__name__)


def checkpoint_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "checkpoints")


def _epoch_dir(output_dir: str, epoch: int) -> str:
    return os.path.join(checkpoint_dir(output_dir), f"epoch_{epoch:05d}")


def save_checkpoint(output_dir: str, params, opt_state, epoch: int, cfg=None,
                    batch_stats=None):
    """Model + optimizer + epoch (the reference saves model_state,
    optimizer, scaler and cfg — checkpoint.py:115-149). ``batch_stats``:
    BN running statistics of the conv families."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(_epoch_dir(output_dir, epoch))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "epoch": np.asarray(epoch),
    }
    if opt_state is not None:
        payload["opt_state"] = jax.tree_util.tree_map(np.asarray, opt_state)
    if batch_stats is not None:
        payload["batch_stats"] = jax.tree_util.tree_map(np.asarray, batch_stats)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if cfg is not None:
        with open(os.path.join(path, "config.yaml"), "w") as f:
            f.write(cfg.dump())
    logger.info("Saved checkpoint %s", path)
    return path


def get_last_checkpoint(output_dir: str) -> Optional[str]:
    d = checkpoint_dir(output_dir)
    if not os.path.isdir(d):
        return None
    names = [n for n in os.listdir(d) if re.match(r"epoch_\d+$", n)]
    if not names:
        return None
    return os.path.join(d, max(names))


def load_checkpoint(path: str, params_template, opt_state_template=None,
                    batch_stats_template=None):
    """Restore (params, epoch) — and the optimizer state / BN
    batch_stats when templates are given and the checkpoint carries
    them. Returns (params, epoch) or (params, opt_state, epoch);
    restored batch_stats are exposed via
    ``load_checkpoint.last_batch_stats`` (None when absent)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": jax.tree_util.tree_map(np.asarray, params_template),
        "epoch": np.asarray(0),
    }
    if batch_stats_template is not None:
        target["batch_stats"] = jax.tree_util.tree_map(
            np.asarray, batch_stats_template
        )
    load_checkpoint.last_batch_stats = None
    if opt_state_template is not None:
        with_opt = dict(target)
        with_opt["opt_state"] = jax.tree_util.tree_map(
            np.asarray, opt_state_template
        )
        try:
            restored = ckptr.restore(os.path.abspath(path), with_opt)
            load_checkpoint.last_batch_stats = restored.get("batch_stats")
            return restored["params"], restored["opt_state"], int(restored["epoch"])
        except Exception:  # older checkpoint without optimizer state
            restored = ckptr.restore(os.path.abspath(path))
            load_checkpoint.last_batch_stats = restored.get("batch_stats")
            return restored["params"], None, int(restored["epoch"])
    try:
        restored = ckptr.restore(os.path.abspath(path), target)
    except Exception:
        # payload richer than the target (opt state / BN stats):
        # restore without a target and take what we need
        restored = ckptr.restore(os.path.abspath(path))
    load_checkpoint.last_batch_stats = restored.get("batch_stats")
    return restored["params"], int(restored["epoch"])


def merge_into_template(template, converted) -> tuple:
    """Overlay converted weights onto the initialised param tree.

    Leaves present in both with matching shapes take the checkpoint
    value; shape mismatches or missing keys keep the random init — the
    reference's classifier resize/drop + partial-load behavior
    (timesformer_helpers.py:150-167, checkpoint.py clear-name paths).
    Returns (params, num_loaded, num_kept_init).
    """
    flat_t = dict(
        jax.tree_util.tree_flatten_with_path(template)[0]
    )
    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    loaded, kept = 0, 0
    out = {}
    for path, leaf in flat_t.items():
        cand = flat_c.get(path)
        if cand is not None and tuple(np.shape(cand)) == tuple(np.shape(leaf)):
            out[path] = np.asarray(cand)
            loaded += 1
        else:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            logger.warning(
                "checkpoint: keeping random init for %s (%s)",
                name,
                "shape mismatch" if cand is not None else "missing",
            )
            out[path] = leaf
            kept += 1
    treedef = jax.tree_util.tree_structure(template)
    ordered = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered), loaded, kept


def load_test_checkpoint(cfg, bundle):
    """Load TEST.CHECKPOINT_FILE_PATH into the model bundle, converting
    torch checkpoints via the per-model converter (reference
    load_test_checkpoint, checkpoint.py:678-749)."""
    path = cfg.TEST.CHECKPOINT_FILE_PATH
    if not path:
        # reference fallback order (checkpoint.py:678-749): last training
        # checkpoint in OUTPUT_DIR, then TRAIN.CHECKPOINT_FILE_PATH
        last = get_last_checkpoint(cfg.OUTPUT_DIR)
        if last is not None:
            bundle.params, _ = load_checkpoint(
                last, bundle.params, batch_stats_template=bundle.batch_stats
            )
            if load_checkpoint.last_batch_stats is not None:
                bundle.batch_stats = load_checkpoint.last_batch_stats
            logger.info("Testing with last train checkpoint %s", last)
            return bundle
        if cfg.TRAIN.CHECKPOINT_FILE_PATH:
            path = cfg.TRAIN.CHECKPOINT_FILE_PATH
        else:
            logger.info("No checkpoint found — random init")
            return bundle
    if os.path.isdir(path):  # native orbax checkpoint
        bundle.params, _ = load_checkpoint(
            path, bundle.params, batch_stats_template=bundle.batch_stats
        )
        if load_checkpoint.last_batch_stats is not None:
            bundle.batch_stats = load_checkpoint.last_batch_stats
        return bundle
    from vtm.checkpoints import convert

    sd = convert.load_torch_state_dict(path)
    if bundle.name == "VideoMAE":
        converted = convert.convert_videomae(sd, depth=bundle.config.depth)
    elif bundle.name == "ViViT":
        converted = convert.convert_vivit(sd, depth=bundle.config.num_hidden_layers)
    elif bundle.name == "TimeSformer":
        converted = convert.convert_timesformer(
            sd,
            depth=bundle.config.depth,
            num_frames=bundle.config.num_frames,
            spatial_tokens=bundle.config.spatial_tokens,
        )
    elif bundle.name == "Motionformer":
        converted = convert.convert_motionformer(sd, depth=bundle.config.depth)
    elif bundle.name == "MViT":
        converted = convert.convert_mvit(sd, depth=bundle.config.depth)
    elif bundle.name == "MaskMViT":
        converted = convert.convert_maskmvit(sd, depth=bundle.config.depth)
    elif bundle.name in ("SlowFast", "ResNet", "X3D"):
        converted, stats = convert.convert_pyslowfast(
            sd, num_splits=bundle.config.norm.num_splits
        )
        if stats:
            bundle.batch_stats = stats
    else:
        raise NotImplementedError(bundle.name)
    if bundle.params is not None:
        bundle.params, loaded, kept = merge_into_template(bundle.params, converted)
        logger.info(
            "Loaded torch checkpoint %s (%d tensors, %d kept init)",
            path,
            loaded,
            kept,
        )
    else:
        bundle.params = converted
        logger.info("Loaded torch checkpoint %s", path)
    return bundle
