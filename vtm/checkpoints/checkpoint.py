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
    """Restore a native checkpoint. ALWAYS returns the 4-tuple
    ``(params, opt_state, epoch, batch_stats)`` — opt_state/batch_stats
    are None when not in the checkpoint (or no template was given)."""
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
    if opt_state_template is not None:
        with_opt = dict(target)
        with_opt["opt_state"] = jax.tree_util.tree_map(
            np.asarray, opt_state_template
        )
        try:
            restored = ckptr.restore(os.path.abspath(path), with_opt)
            return (restored["params"], restored["opt_state"],
                    int(restored["epoch"]), restored.get("batch_stats"))
        except Exception as e:
            # a silent optimizer reset is a training regression — say
            # loudly why momentum/Adam moments are starting fresh
            logger.warning(
                "checkpoint %s: optimizer state not restored (%s: %s) — "
                "resuming with a FRESH optimizer state", path,
                type(e).__name__, str(e)[:300],
            )
            restored = ckptr.restore(os.path.abspath(path))
            return (restored["params"], None, int(restored["epoch"]),
                    restored.get("batch_stats"))
    try:
        restored = ckptr.restore(os.path.abspath(path), target)
    except Exception:
        # payload richer than the target (opt state / BN stats):
        # restore without a target and take what we need
        restored = ckptr.restore(os.path.abspath(path))
    return (restored["params"], None, int(restored["epoch"]),
            restored.get("batch_stats"))


def clear_name_pattern_keys(sd, patterns):
    """Strip each pattern's FIRST occurrence from torch state-dict keys
    (reference checkpoint.py:326-339, TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN
    — e.g. ("backbone.",) when loading detection backbones)."""
    for item in patterns or ():
        renamed = {}
        for k, v in sd.items():
            if item in k:
                k_re = k.replace(item, "", 1)
                logger.info("checkpoint: renaming %s -> %s", k, k_re)
                renamed[k_re] = v
            else:
                renamed[k] = v
        sd = renamed
    return sd


def _unflatten_paths(leaves):
    """Rebuild a nested dict from {tree_flatten_with_path path: leaf}."""
    result = {}
    for path, v in leaves.items():
        node = result
        keys = [str(getattr(p, "key", p)) for p in path]
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return result


def inflate_weights(converted, template):
    """Generic 2D->3D conv inflation (reference inflate_weight,
    checkpoint.py:152-190 / I3D bootstrapping): a 4-D (h, w, i, o)
    kernel matching a 5-D (t, h, w, i, o) template inflates by
    repeating over t and dividing by t; everything else passes through
    unchanged. Returns ONLY converted/inflated leaves (never template
    leaves) so merge_into_template keeps the loaded/kept-init
    accounting and its "keeping random init" warnings — mismatches
    (the reference logs "Unexpected" and drops) surface there."""
    flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    shapes_t = {path: tuple(np.shape(leaf)) for path, leaf in flat_t}
    out = {}
    for path, cand in flat_c.items():
        cand = np.asarray(cand)
        tgt = shapes_t.get(path)
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if tgt is not None and cand.ndim == 4 and len(tgt) == 5 and (
            cand.shape == tgt[1:]
        ):
            logger.info("Inflate %s: %s -> %s", name, cand.shape, tgt)
            cand = np.repeat(cand[None], tgt[0], axis=0) / tgt[0]
        elif tgt is not None and cand.shape != tgt:
            logger.info("Unexpected %s: %s -|> %s", name, cand.shape, tgt)
        out[path] = cand
    return _unflatten_paths(out)


def _interp_linear(arr: np.ndarray, new_len: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) along
    axis 0 of an [L, C] array."""
    L = arr.shape[0]
    if L == new_len:
        return arr
    pos = (np.arange(new_len) + 0.5) * L / new_len - 0.5
    lo = np.clip(np.floor(pos).astype(np.int64), 0, L - 1)
    hi = np.clip(lo + 1, 0, L - 1)
    w = np.clip(pos - lo, 0.0, 1.0)[:, None]
    return arr[lo] * (1 - w) + arr[hi] * w


def image_init_adapt(converted, template):
    """TRAIN.CHECKPOINT_IN_INIT surgeries for image-initialised MViT
    (reference checkpoint.py:343-460, post-conversion form): 4-D patch/
    pool kernels repeat over the template's time extent WITHOUT the /t
    normalisation (unlike CHECKPOINT_INFLATE — a reference quirk), a
    time-1 pool kernel repeats to time-t, and rel_pos_* tables of the
    wrong length linearly interpolate. (The reference's video->img
    deflation direction serves image models only and is out of scope —
    documented, not built.)"""
    flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    out = {}
    for path, leaf in flat_t:
        cand = flat_c.get(path)
        if cand is None:
            continue
        cand = np.asarray(cand)
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        tgt = tuple(np.shape(leaf))
        if cand.shape == tgt:
            out[path] = cand
            continue
        if cand.ndim == 4 and len(tgt) == 5 and cand.shape == tgt[1:]:
            logger.info("image_init: inflate %s to t=%d", name, tgt[0])
            out[path] = np.repeat(cand[None], tgt[0], axis=0)
        elif (
            cand.ndim == 5
            and len(tgt) == 5
            and cand.shape[0] == 1
            and cand.shape[1:] == tgt[1:]
        ):
            logger.info("image_init: repeat %s to t=%d", name, tgt[0])
            out[path] = np.repeat(cand, tgt[0], axis=0)
        elif "rel_pos" in name and cand.ndim == 2 and len(tgt) == 2 and cand.shape[1] == tgt[1]:
            logger.info(
                "image_init: interpolating %s %s -> %s", name, cand.shape, tgt
            )
            out[path] = _interp_linear(cand, tgt[0])
        else:
            out[path] = cand  # merge_into_template will warn/keep init
    # rebuild a converted-shaped dict (paths map to nested dict keys)
    return _unflatten_paths(out)


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


def merge_bn_stats(template, converted, num_splits: int = 1):
    """Overlay converted BN running stats onto the model's batch_stats
    template, expanding plain-BN checkpoints into sub-BN models: a
    template ``split_mean/split_var`` [k, C] missing from the converted
    tree is tiled from the checkpoint's plain ``mean/var`` [C] — the
    reference's normal_to_sub_bn (checkpoint.py:637-677, which repeats
    the stats per split). Missing nodes keep the template value."""

    def walk(tmpl, conv):
        out = {}
        for k, v in tmpl.items():
            if isinstance(v, dict):
                out[k] = walk(v, conv.get(k, {}) if isinstance(conv, dict) else {})
                continue
            cand = conv.get(k) if isinstance(conv, dict) else None
            if cand is not None and np.shape(cand) == np.shape(v):
                out[k] = np.asarray(cand)
            elif (
                k in ("split_mean", "split_var")
                and isinstance(conv, dict)
                and conv.get(k.split("_")[1]) is not None
                and np.shape(v) == (num_splits,) + np.shape(conv[k.split("_")[1]])
            ):
                out[k] = np.tile(
                    np.asarray(conv[k.split("_")[1]]), (num_splits, 1)
                )
            else:
                if cand is not None:
                    logger.warning(
                        "batch_stats: keeping init for %s (shape mismatch)", k
                    )
                out[k] = v
        return out

    return walk(template, converted)


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
            bundle.params, _, _, bstats = load_checkpoint(
                last, bundle.params, batch_stats_template=bundle.batch_stats
            )
            if bstats is not None:
                bundle.batch_stats = bstats
            logger.info("Testing with last train checkpoint %s", last)
            return bundle
        if cfg.TRAIN.CHECKPOINT_FILE_PATH:
            path = cfg.TRAIN.CHECKPOINT_FILE_PATH
        else:
            logger.info("No checkpoint found — random init")
            return bundle
    if os.path.isdir(path):  # native orbax checkpoint
        bundle.params, _, _, bstats = load_checkpoint(
            path, bundle.params, batch_stats_template=bundle.batch_stats
        )
        if bstats is not None:
            bundle.batch_stats = bstats
        return bundle
    from vtm.checkpoints import convert

    sd = convert.load_torch_state_dict(path)
    sd = clear_name_pattern_keys(
        sd, tuple(cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN)
    )
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
            if bundle.batch_stats is not None:
                # merge into the template (plain-BN ckpt -> sub-BN model
                # tiles the running stats per split; partial ckpts keep
                # the init for missing nodes, like merge_into_template)
                bundle.batch_stats = merge_bn_stats(
                    bundle.batch_stats, stats,
                    bundle.config.norm.num_splits,
                )
            else:
                bundle.batch_stats = stats
    else:
        raise NotImplementedError(bundle.name)
    if bundle.params is not None:
        if cfg.TRAIN.CHECKPOINT_INFLATE:
            # 2D->3D conv inflation against the model template
            converted = inflate_weights(converted, bundle.params)
        elif cfg.TRAIN.CHECKPOINT_IN_INIT:
            converted = image_init_adapt(converted, bundle.params)
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
