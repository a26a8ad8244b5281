"""Grad-CAM + visualization driver tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from vtm.config import assert_and_infer_cfg, get_cfg
from vtm.models.build import build_model


def _tiny_videomae_cfg(tmp_path, trace=True, r=1):
    cfg = get_cfg()
    cfg.merge_from_list([
        "MODEL.MODEL_NAME", "VideoMAE",
        "VIDEOMAE.MODEL", "vit_small_patch16_224",
        "MODEL.NUM_CLASSES", "5",
        "DATA.NUM_FRAMES", "4",
        "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.TEST_CROP_SIZE", "32",
        "TEST.DATASET", "synthetic",
        "TEST.BATCH_SIZE", "2",
        "TEST.NUM_ENSEMBLE_VIEWS", "1",
        "TEST.NUM_SPATIAL_CROPS", "1",
        "TOME.ENABLE", "True",
        "TOME.R_VALUE", str(r),
        "TOME.TRACE_SOURCE", str(trace),
        "TPU.COMPUTE_DTYPE", "float32",
        "DATA_LOADER.NUM_WORKERS", "1",
        "OUTPUT_DIR", str(tmp_path),
    ])
    return assert_and_infer_cfg(cfg)


def test_gradcam_maps_unmerged(tmp_path):
    from vtm.vis.gradcam import GradCAM

    cfg = _tiny_videomae_cfg(tmp_path, trace=False, r=0)
    cfg.TOME.ENABLE = False
    bundle = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 32, 32, 3)), jnp.float32
    )
    cam = GradCAM(bundle)
    maps, preds = cam.localization_map(x)
    # VideoMAE tiny: (4/2)*(32/16)^2 = 8 tokens
    assert maps.shape == (2, 8)
    assert preds.shape == (2, 5)
    assert np.isfinite(maps).all() and maps.min() >= 0 and maps.max() <= 1.0

    overlay = cam.overlay(np.random.rand(4, 32, 32, 3), maps[0])
    assert overlay.shape == (4, 32, 32, 3) and overlay.dtype == np.uint8


def test_gradcam_maps_merged_source_unroll(tmp_path):
    from vtm.vis.gradcam import GradCAM

    cfg = _tiny_videomae_cfg(tmp_path, trace=True, r=1)
    bundle = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 4, 32, 32, 3)), jnp.float32
    )
    cam = GradCAM(bundle)
    maps, _ = cam.localization_map(x)
    # map is broadcast back to the ORIGINAL 8-token grid
    assert maps.shape == (1, 8)
    assert np.isfinite(maps).all()


def test_visualization_driver_end_to_end(tmp_path):
    from tools.visualization import run_visualization

    cfg = _tiny_videomae_cfg(tmp_path, trace=True, r=1)
    cfg.TENSORBOARD.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.INPUT_VIDEO = True
    cfg.TENSORBOARD.MODEL_VIS.MODEL_WEIGHTS = True
    cfg.TENSORBOARD.MODEL_VIS.MAX_BATCHES = 1
    cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE = True
    run_visualization(cfg)
    assert list(tmp_path.glob("runs-*/events.out.tfevents.*"))
