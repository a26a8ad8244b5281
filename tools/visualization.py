#!/usr/bin/env python3
"""Model visualisation driver (reference: tools/visualization.py:1-185,
driven by TENSORBOARD.MODEL_VIS / WRONG_PRED_VIS).

Supports: Grad-CAM overlays, raw input video, parameter histograms,
and wrong-prediction logging — all written to TensorBoard.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402

from vtm.checkpoints.checkpoint import load_test_checkpoint  # noqa: E402
from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.data import construct_loader  # noqa: E402
from vtm.models import build_model  # noqa: E402
from vtm.utils.env import setup_environment  # noqa: E402
from vtm.utils.logging import get_logger, setup_logging  # noqa: E402
from vtm.vis.gradcam import GradCAM  # noqa: E402
from vtm.vis.tensorboard_vis import TensorboardWriter  # noqa: E402

logger = get_logger(__name__)


def _to01(frames: np.ndarray) -> np.ndarray:
    lo, hi = frames.min(), frames.max()
    return (frames - lo) / max(hi - lo, 1e-8)


def log_model_weights(bundle, writer):
    """Parameter histograms (reference plot_weights_and_activations)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(bundle.params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        writer.writer.add_histogram(f"weights/{name}", np.asarray(leaf))


def run_visualization(cfg):
    setup_environment()
    setup_logging(cfg.OUTPUT_DIR)
    bundle = build_model(cfg)
    bundle = load_test_checkpoint(cfg, bundle)
    writer = TensorboardWriter(cfg)

    mv = cfg.TENSORBOARD.MODEL_VIS
    if mv.MODEL_WEIGHTS:
        log_model_weights(bundle, writer)

    loader = construct_loader(cfg, "test")
    cams = []
    if mv.GRAD_CAM.ENABLE:
        # EVERY entry of GRAD_CAM.LAYER_LIST gets its own overlay pass
        # (reference tools/visualization.py iterates layer_ls)
        for layer in mv.GRAD_CAM.LAYER_LIST or [None]:
            cams.append(
                (layer, GradCAM(bundle, target_layer=layer,
                                colormap=mv.GRAD_CAM.COLORMAP))
            )

    act_layers, act_indexing = [], {}
    if mv.ACTIVATIONS:
        from vtm.vis.activations import process_layer_index_data

        act_layers, act_indexing = process_layer_index_data(mv.LAYER_LIST)

    wrong_tag = cfg.TENSORBOARD.WRONG_PRED_VIS.TAG
    for bi, batch in enumerate(loader):
        if bi >= mv.MAX_BATCHES:
            break
        frames = np.asarray(batch["frames"])
        if mv.INPUT_VIDEO:
            writer.add_video(_to01(frames), tag="Video Input", global_step=bi)
        preds = None
        for layer, cam in cams:
            maps, preds = cam.localization_map(jnp.asarray(frames))
            overlays = np.stack(
                [cam.overlay(_to01(frames[i]), maps[i]) for i in range(len(frames))]
            )
            tag = "GradCAM" if layer is None else f"GradCAM/{layer}"
            writer.add_video(
                overlays.astype(np.float32) / 255.0, tag=tag, global_step=bi
            )
        if mv.ACTIVATIONS:
            # reference GetWeightAndActivation path (MODEL_VIS.ACTIVATIONS)
            from vtm.vis.activations import get_activations

            acts, preds = get_activations(
                bundle, frames, act_layers, indexing=act_indexing
            )
            for name, arr in acts.items():
                writer.writer.add_histogram(
                    f"activations/{name}", np.asarray(arr), global_step=bi
                )
        if preds is None:
            # bundle.variables carries batch_stats for the conv families
            logits, _ = bundle.module.apply(
                bundle.variables, jnp.asarray(frames)
            )
            preds = np.asarray(logits if not isinstance(logits, tuple) else logits[0])
        if mv.TOPK_PREDS:
            from vtm.vis.activations import plot_topk_histogram

            for i in range(len(preds)):
                fig = plot_topk_histogram(
                    "Top-k predictions", preds[i], k=min(mv.TOPK_PREDS, preds.shape[-1])
                )
                writer.writer.add_figure(
                    f"topk_preds/batch{bi}", fig, global_step=i
                )
        if cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE and not isinstance(
            batch["label"], dict
        ):
            wrong = preds.argmax(axis=-1) != np.asarray(batch["label"])
            if wrong.any():
                writer.add_video(
                    _to01(frames[wrong]), tag=wrong_tag, global_step=bi
                )
    writer.close()
    logger.info("visualization written to tensorboard")


def main():
    args = parse_args()
    for path in args.cfg_files or [None]:
        cfg = load_config(args, path)
        assert_and_infer_cfg(cfg)
        run_visualization(cfg)


if __name__ == "__main__":
    main()
