"""Layer-duplication experiments (reference tome/patch/*.apply_duplicate_patch
+ tools/test_net.py:273-281 r-schedule construction)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtm.config import assert_and_infer_cfg, get_cfg
from vtm.models.build import build_model, duplication_plan, make_policy


def _cfg_with_duplication(model_name, tmp_path, layer=0, quantity=3, r=1):
    cfg = get_cfg()
    opts = [
        "MODEL.MODEL_NAME", model_name,
        "MODEL.NUM_CLASSES", "5",
        "DATA.NUM_FRAMES", "4",
        "DATA.TEST_CROP_SIZE", "32",
        "DATA.TRAIN_CROP_SIZE", "32",
        "TOME.ENABLE", "True",
        "TOME.R_VALUE", str(r),
        "TOME.LAYER_TO_DUPLICATE", str(layer),
        "TOME.LAYER_QUANTITY", str(quantity),
        "TPU.COMPUTE_DTYPE", "float32",
    ]
    if model_name == "ViViT":
        d = {
            "video_size": [4, 32, 32],
            "tubelet_size": [2, 16, 16],
            "num_channels": 3,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "intermediate_size": 64,
            "hidden_act": "gelu_fast",
            "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0,
            "initializer_range": 0.02,
            "layer_norm_eps": 1e-6,
            "qkv_bias": True,
        }
        p = tmp_path / "vivit.json"
        p.write_text(json.dumps(d))
        opts += ["VIVIT.CONFIG_PATH", str(p)]
    return assert_and_infer_cfg(cfg.merge_from_list(opts) or cfg)


def test_plan_shape():
    cfg = get_cfg()
    cfg.TOME.ENABLE = True
    cfg.TOME.LAYER_TO_DUPLICATE = 1
    cfg.TOME.LAYER_QUANTITY = 3
    plan = duplication_plan(cfg, 4)
    # layer 1 executed 3x: first two metric-only, then the full block
    assert plan == ((0, False), (1, True), (1, True), (1, False), (2, False), (3, False))
    rs = make_policy(cfg, 4, n_protected_class_token=False).rs
    assert rs == (0, cfg.TOME.R_VALUE, cfg.TOME.R_VALUE, cfg.TOME.R_VALUE, 0, 0)


def test_plan_disabled():
    cfg = get_cfg()
    cfg.TOME.ENABLE = True
    cfg.TOME.LAYER_QUANTITY = 1
    assert duplication_plan(cfg, 4) is None


def test_vivit_duplication_no_new_params(tmp_path):
    cfg = _cfg_with_duplication("ViViT", tmp_path, layer=0, quantity=3, r=1)
    bundle = build_model(cfg)
    base_cfg = _cfg_with_duplication("ViViT", tmp_path, layer=0, quantity=1, r=1)
    base = build_model(base_cfg)
    # duplication reuses block parameters: same param tree structure
    dup_names = jax.tree_util.tree_structure(bundle.params)
    base_names = jax.tree_util.tree_structure(base.params)
    assert dup_names == base_names
    # forward runs and merges r tokens per executed layer (3 dup + 1 normal)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 32, 32, 3)), jnp.float32
    )
    logits, state = bundle.module.apply({"params": bundle.params}, x)
    assert np.asarray(logits).shape == (1, 5)
    # tokens: 2*2*2=8 +1 cls = 9; r=1 at the three duplicated steps only
    assert state.size.shape[1] == 9 - 3


def test_timesformer_duplication_runs(tmp_path):
    cfg = _cfg_with_duplication("TimeSformer", tmp_path, layer=1, quantity=2, r=1)
    cfg.TIMESFORMER.ATTENTION_TYPE = "divided_space_time"
    bundle = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 32, 32, 3)), jnp.float32
    )
    logits, _ = bundle.module.apply({"params": bundle.params}, x)
    assert np.asarray(logits).shape == (1, 5)
