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


def test_gradcam_merged_without_trace_source_flag(tmp_path):
    """Default TOME.TRACE_SOURCE=False + merging: GradCAM must force
    source tracing itself (a merged-size map cannot reshape to the
    original grid in overlay)."""
    from vtm.vis.gradcam import GradCAM

    cfg = _tiny_videomae_cfg(tmp_path, trace=False, r=1)
    bundle = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 4, 32, 32, 3)),
        jnp.float32,
    )
    maps, _ = GradCAM(bundle).localization_map(x)
    assert maps.shape == (1, 8)
    assert np.isfinite(maps).all()


def test_gradcam_cls_model_merged(tmp_path):
    """ViViT (CLS-protected spatio-temporal merging): the source
    adjacency carries CLS on BOTH axes; the unrolled map must come back
    at the original CLS-less grid and reshape in overlay."""
    import json

    from vtm.vis.gradcam import GradCAM

    d = {
        "video_size": [4, 32, 32],
        "tubelet_size": [2, 16, 16],
        "num_channels": 3,
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 2,
        "intermediate_size": 64,
        "hidden_act": "gelu_fast",
        "layer_norm_eps": 1e-6,
        "qkv_bias": True,
    }
    p = tmp_path / "vivit.json"
    p.write_text(json.dumps(d))
    cfg = get_cfg()
    cfg.merge_from_list([
        "MODEL.MODEL_NAME", "ViViT",
        "VIVIT.CONFIG_PATH", str(p),
        "MODEL.NUM_CLASSES", "5",
        "DATA.NUM_FRAMES", "4",
        "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.TEST_CROP_SIZE", "32",
        "TOME.ENABLE", "True",
        "TOME.R_VALUE", "1",
        "TPU.COMPUTE_DTYPE", "float32",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    bundle = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 32, 32, 3)),
        jnp.float32,
    )
    cam = GradCAM(bundle)
    maps, _ = cam.localization_map(x)
    assert maps.shape == (1, 8)  # (4/2)*(32/16)^2 CLS-less grid
    assert np.isfinite(maps).all()
    overlay = cam.overlay(np.random.rand(4, 32, 32, 3), maps[0])
    assert overlay.shape == (4, 32, 32, 3)


def test_gradcam_per_frame_model_merged(tmp_path):
    """TimeSformer (per-frame merging): source is frame-folded
    [(B*T), p_t, p_0]; the unroll must fold/unfold through the
    spatial-major (p t) flat order."""
    import jax

    from vtm.merge.policy import MergePolicy
    from vtm.models.build import ModelBundle
    from vtm.models.timesformer import TimeSformer, TimeSformerConfig
    from vtm.vis.gradcam import GradCAM

    config = TimeSformerConfig(
        img_size=32, num_classes=5, num_frames=2, embed_dim=32, depth=2,
        num_heads=2,
    )
    policy = MergePolicy(rs=(1, 1), mode="merge", trace_source=True)
    module = TimeSformer(config=config, policy=policy)
    x0 = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
    params = module.init(jax.random.key(0), x0)["params"]
    bundle = ModelBundle(
        module=module, params=params, config=config, policy=policy,
        name="TimeSformer",
    )
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 2, 32, 32, 3)),
        jnp.float32,
    )
    cam = GradCAM(bundle)
    maps, _ = cam.localization_map(x)
    assert maps.shape == (1, 2 * 4)  # T * (32/16)^2, (p t) order
    assert np.isfinite(maps).all()
    overlay = cam.overlay(np.random.rand(2, 32, 32, 3), maps[0])
    assert overlay.shape == (2, 32, 32, 3)
