"""vtm.patch — the tome.patch-compatible migration surface."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vtm.patch as patch
from vtm.config import assert_and_infer_cfg, get_cfg
from vtm.models.build import build_model


def _bundle(tmp_path):
    d = {
        "video_size": [4, 32, 32], "tubelet_size": [2, 16, 16],
        "num_channels": 3, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 2, "intermediate_size": 64,
        "hidden_act": "gelu_fast", "layer_norm_eps": 1e-6, "qkv_bias": True,
    }
    p = tmp_path / "vivit.json"
    p.write_text(json.dumps(d))
    cfg = get_cfg()
    cfg.merge_from_list([
        "MODEL.MODEL_NAME", "ViViT",
        "VIVIT.CONFIG_PATH", str(p),
        "MODEL.NUM_CLASSES", "5",
        "DATA.NUM_FRAMES", "4",
        "DATA.TEST_CROP_SIZE", "32",
        "TOME.ENABLE", "False",
        "TPU.COMPUTE_DTYPE", "float32",
    ])
    return build_model(assert_and_infer_cfg(cfg))


def test_patch_and_r_assignment(tmp_path):
    bundle = _bundle(tmp_path)
    patch.vivit(bundle, trace_source=True)
    bundle.r = 1  # notebook flow: patch -> model.r -> forward
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 32, 32, 3)), jnp.float32
    )
    logits, state = bundle.apply(x)
    assert np.asarray(logits).shape == (1, 5)
    # source traced: [B, n_final, n_0]; 9 tokens - 2 merged
    assert state.source.shape == (1, 7, 9)


def test_r_schedule_tuple_and_list(tmp_path):
    bundle = _bundle(tmp_path)
    patch.vivit(bundle)
    bundle.r = (2, 1.0)  # increasing schedule
    assert sum(bundle.r) > 0 and len(bundle.r) == 2
    bundle.r = [1, 0]
    assert bundle.r == (1, 0)


def test_duplicate_patch(tmp_path):
    bundle = _bundle(tmp_path)
    patch.vivit(bundle)
    patch.duplicate_vivit(bundle, layer_to_duplicate=0, quantity=3)
    bundle.r = [1, 1, 1, 0]  # executed depth = 2 + 2 duplicates
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 4, 32, 32, 3)), jnp.float32
    )
    logits, state = bundle.apply(x)
    assert np.asarray(logits).shape == (1, 5)
    assert state.size.shape[1] == 9 - 3
