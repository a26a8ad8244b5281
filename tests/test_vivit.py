"""ViViT golden tests vs HF transformers VivitForVideoClassification."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtm.checkpoints.convert import convert_vivit
from vtm.merge.policy import MergePolicy
from vtm.models.vivit import ViViT, ViViTConfig

TINY = ViViTConfig(
    image_size=32,
    num_frames=4,
    tubelet_size=(2, 16, 16),
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    num_classes=5,
)


def _hf_tiny():
    torch = pytest.importorskip("torch")
    from transformers import VivitConfig as HFConfig
    from transformers import VivitForVideoClassification

    torch.manual_seed(0)
    hf = VivitForVideoClassification(
        HFConfig(
            image_size=TINY.image_size,
            num_frames=TINY.num_frames,
            tubelet_size=list(TINY.tubelet_size),
            hidden_size=TINY.hidden_size,
            num_hidden_layers=TINY.num_hidden_layers,
            num_attention_heads=TINY.num_attention_heads,
            intermediate_size=TINY.intermediate_size,
            hidden_act="gelu_fast",
            num_labels=TINY.num_classes,
            attn_implementation="eager",
        )
    ).eval()
    # break the zero-init symmetry of cls/pos embeddings
    torch.nn.init.normal_(hf.vivit.embeddings.cls_token, std=0.5)
    torch.nn.init.normal_(hf.vivit.embeddings.position_embeddings, std=0.5)
    return hf


def test_unmerged_logits_match_hf():
    import torch

    hf = _hf_tiny()
    params = convert_vivit(hf.state_dict(), depth=TINY.num_hidden_layers)
    model = ViViT(config=TINY)

    rng = np.random.default_rng(0)
    video = rng.standard_normal(
        (2, TINY.num_frames, TINY.image_size, TINY.image_size, 3)
    ).astype(np.float32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(video).permute(0, 1, 4, 2, 3)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got, _ = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_merged_forward_matches_torch_oracle(ref_merge):
    """Full merged-forward logits parity vs a torch re-derivation of the
    reference ViViT ToMe pipeline (tome/patch/vivit.py:17-130): CLS-
    protected matching, full-column prop-attn bias, merge between the
    attention residual and the MLP."""
    from torch_oracles import vivit_tome_forward

    hf = _hf_tiny()
    sd = dict(hf.state_dict())
    params = convert_vivit(sd, depth=TINY.num_hidden_layers)
    policy = MergePolicy(rs=(1, 1), mode="merge", prop_attn=True, class_token=True)
    model = ViViT(config=TINY, policy=policy)

    rng = np.random.default_rng(7)
    video = rng.standard_normal(
        (2, TINY.num_frames, TINY.image_size, TINY.image_size, 3)
    ).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        got, state = model.apply({"params": params}, jnp.asarray(video))

    ref_logits, ref_tokens = vivit_tome_forward(
        sd, video, rs=[1, 1], ref_merge=ref_merge,
        depth=TINY.num_hidden_layers, heads=TINY.num_attention_heads,
        embed_dim=TINY.hidden_size, tubelet_size=TINY.tubelet_size,
    )
    assert int(state.size.shape[1]) == ref_tokens  # size covers all tokens incl. CLS
    np.testing.assert_allclose(np.asarray(got), ref_logits, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "mode,threshold",
    [("drop", 0.0), ("hybrid", 0.0), ("hybrid", 0.8)],
)
def test_mode_forward_matches_torch_oracle(ref_merge, mode, threshold):
    """In-model ablation-mode parity with CLS protection (reference
    vivit_{drop,hybrid}, tome/patch/vivit.py:152-204): drop's
    CLS-protected undropped set sorts CLS back to the front and resets
    size to ones; hybrid zeroes sub-threshold destinations under the
    full-column prop-attn bias."""
    from torch_oracles import vivit_tome_forward

    import dataclasses

    cfg = dataclasses.replace(TINY, image_size=64)  # 2*16+1 = 33 tokens
    torch = pytest.importorskip("torch")
    from transformers import VivitConfig as HFConfig
    from transformers import VivitForVideoClassification

    torch.manual_seed(5)
    hf = VivitForVideoClassification(
        HFConfig(
            image_size=cfg.image_size,
            num_frames=cfg.num_frames,
            tubelet_size=list(cfg.tubelet_size),
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            num_labels=cfg.num_classes,
        )
    ).eval()
    sd = dict(hf.state_dict())
    params = convert_vivit(sd, depth=cfg.num_hidden_layers)
    policy = MergePolicy(
        rs=(5, 5), mode=mode, threshold=threshold,
        prop_attn=True, class_token=True,
    )
    model = ViViT(config=cfg, policy=policy)

    rng = np.random.default_rng(9)
    video = rng.standard_normal(
        (2, cfg.num_frames, cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        got, state = model.apply({"params": params}, jnp.asarray(video))

    ref_logits, ref_tokens = vivit_tome_forward(
        sd, video, rs=[5, 5], ref_merge=ref_merge,
        depth=cfg.num_hidden_layers, heads=cfg.num_attention_heads,
        embed_dim=cfg.hidden_size, tubelet_size=cfg.tubelet_size,
        mode=mode, threshold=threshold,
    )
    np.testing.assert_allclose(np.asarray(got), ref_logits, rtol=2e-3, atol=2e-3)
    assert int(state.size.shape[1]) == ref_tokens == 33 - 10
    sizes = np.asarray(state.size)
    assert sizes[:, 0].max() == 1.0  # CLS never reduced
    if mode == "drop":
        np.testing.assert_array_equal(sizes, 1.0)


def test_merged_cls_protected():
    """With merging on, the CLS token must never be merged: sizes stay 1
    at position 0 (reference: merge.py:59-62,71-73)."""
    policy = MergePolicy(rs=(1, 1), mode="merge", prop_attn=True, class_token=True)
    model = ViViT(config=TINY, policy=policy)
    video = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (1, TINY.num_frames, TINY.image_size, TINY.image_size, 3)
        ),
        dtype=jnp.float32,
    )
    params = model.init(jax.random.key(0), video)["params"]
    logits, state = model.apply({"params": params}, video)
    assert logits.shape == (1, TINY.num_classes)
    sizes = np.asarray(state.size)
    assert sizes.shape[1] == TINY.tokens - 2
    assert sizes[:, 0].max() == 1.0  # CLS size unchanged
    assert sizes.sum() == TINY.tokens  # mass conserved


def test_epic_twin_heads():
    cfg = ViViTConfig(
        image_size=TINY.image_size,
        num_frames=TINY.num_frames,
        tubelet_size=TINY.tubelet_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        intermediate_size=TINY.intermediate_size,
        num_classes=(97, 300),
    )
    model = ViViT(config=cfg)
    video = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init(jax.random.key(0), video)["params"]
    (verb, noun), _ = model.apply({"params": params}, video)
    assert verb.shape == (1, 97) and noun.shape == (1, 300)


def test_config_from_json(tmp_path):
    d = {
        "video_size": [16, 224, 224],
        "tubelet_size": [2, 16, 16],
        "num_channels": 3,
        "hidden_size": 768,
        "num_hidden_layers": 12,
        "num_attention_heads": 12,
        "intermediate_size": 3072,
        "hidden_act": "gelu_fast",
        "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0,
        "initializer_range": 0.02,
        "layer_norm_eps": 1e-6,
        "qkv_bias": True,
    }
    p = tmp_path / "vivit.json"
    p.write_text(json.dumps(d))
    cfg = ViViTConfig.from_json(str(p), 400)
    assert cfg.tokens == 8 * 14 * 14 + 1
    assert cfg.hidden_size == 768
