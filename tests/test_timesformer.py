"""TimeSformer golden tests vs HF TimesformerForVideoClassification and
merged-mode invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtm.checkpoints.convert import convert_timesformer
from vtm.merge.policy import MergePolicy
from vtm.models.timesformer import TimeSformer, TimeSformerConfig

TINY = TimeSformerConfig(
    img_size=32,
    patch_size=16,
    num_classes=5,
    embed_dim=32,
    depth=2,
    num_heads=2,
    mlp_ratio=2.0,
    num_frames=4,
)


def _hf_tiny():
    torch = pytest.importorskip("torch")
    from transformers import TimesformerConfig as HFConfig
    from transformers import TimesformerForVideoClassification

    torch.manual_seed(0)
    hf = TimesformerForVideoClassification(
        HFConfig(
            image_size=TINY.img_size,
            patch_size=TINY.patch_size,
            num_frames=TINY.num_frames,
            hidden_size=TINY.embed_dim,
            num_hidden_layers=TINY.depth,
            num_attention_heads=TINY.num_heads,
            intermediate_size=int(TINY.embed_dim * TINY.mlp_ratio),
            num_labels=TINY.num_classes,
            attention_type="divided_space_time",
            attn_implementation="eager",
        )
    ).eval()
    import torch as _t

    _t.nn.init.normal_(hf.timesformer.embeddings.cls_token, std=0.5)
    _t.nn.init.normal_(hf.timesformer.embeddings.position_embeddings, std=0.5)
    _t.nn.init.normal_(hf.timesformer.embeddings.time_embeddings, std=0.5)
    return hf


def test_unmerged_logits_match_hf():
    import torch

    hf = _hf_tiny()
    params = convert_timesformer(
        hf.state_dict(),
        depth=TINY.depth,
        num_frames=TINY.num_frames,
        spatial_tokens=TINY.spatial_tokens,
    )
    model = TimeSformer(config=TINY)
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, TINY.num_frames, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(video).permute(0, 1, 4, 2, 3)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got, _ = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_merged_forward_matches_torch_oracle(ref_merge):
    """Full merged-forward logits parity vs a torch re-derivation of the
    reference TimeSformer ToMe pipeline (tome/patch/timesformer.py:12-109):
    divided space-time attention, per-frame CLS strip + frame-average,
    the ``attn[:, :, 1:, 1:]`` proportional bias, per-frame merging."""
    from torch_oracles import timesformer_tome_forward

    hf = _hf_tiny()
    sd = dict(hf.state_dict())
    params = convert_timesformer(
        sd, depth=TINY.depth, num_frames=TINY.num_frames,
        spatial_tokens=TINY.spatial_tokens,
    )
    policy = MergePolicy(rs=(1, 1), mode="merge", prop_attn=True)
    model = TimeSformer(config=TINY, policy=policy)

    rng = np.random.default_rng(11)
    video = rng.standard_normal((2, TINY.num_frames, 32, 32, 3)).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        got, state = model.apply({"params": params}, jnp.asarray(video))

    ref_logits, ref_tokens = timesformer_tome_forward(
        sd, video, rs=[1, 1], ref_merge=ref_merge,
        depth=TINY.depth, heads=TINY.num_heads, embed_dim=TINY.embed_dim,
        patch=TINY.patch_size,
    )
    # per-frame P went 4 -> 2; sequence = 1 + P*T
    assert ref_tokens == 1 + 2 * TINY.num_frames
    assert state.size.shape == (2 * TINY.num_frames, 2, 1)
    np.testing.assert_allclose(np.asarray(got), ref_logits, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "mode,threshold",
    [("drop", 0.0), ("hybrid", 0.0), ("hybrid", 0.8)],
)
def test_mode_forward_matches_torch_oracle(ref_merge, mode, threshold):
    """In-model ablation-mode parity on the per-frame fold (reference
    timesformer_{drop,hybrid}, tome/patch/timesformer.py:112-167):
    class_token=False on the matcher (CLS is stripped before the
    '(b t) p' rearrange, not matcher-protected), drop resets the
    per-frame size tensor to ones."""
    import dataclasses

    from torch_oracles import timesformer_tome_forward

    cfg = dataclasses.replace(TINY, img_size=64)  # P=16 per frame
    torch = pytest.importorskip("torch")
    from transformers import TimesformerConfig as HFConfig
    from transformers import TimesformerForVideoClassification

    torch.manual_seed(7)
    hf = TimesformerForVideoClassification(
        HFConfig(
            image_size=cfg.img_size,
            patch_size=cfg.patch_size,
            num_frames=cfg.num_frames,
            hidden_size=cfg.embed_dim,
            num_hidden_layers=cfg.depth,
            num_attention_heads=cfg.num_heads,
            intermediate_size=int(cfg.embed_dim * cfg.mlp_ratio),
            num_labels=cfg.num_classes,
        )
    ).eval()
    sd = dict(hf.state_dict())
    params = convert_timesformer(
        sd, depth=cfg.depth, num_frames=cfg.num_frames,
        spatial_tokens=cfg.spatial_tokens,
    )
    policy = MergePolicy(rs=(3, 3), mode=mode, threshold=threshold, prop_attn=True)
    model = TimeSformer(config=cfg, policy=policy)

    rng = np.random.default_rng(13)
    video = rng.standard_normal(
        (2, cfg.num_frames, cfg.img_size, cfg.img_size, 3)
    ).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        got, state = model.apply({"params": params}, jnp.asarray(video))

    ref_logits, ref_tokens = timesformer_tome_forward(
        sd, video, rs=[3, 3], ref_merge=ref_merge,
        depth=cfg.depth, heads=cfg.num_heads, embed_dim=cfg.embed_dim,
        patch=cfg.patch_size, mode=mode, threshold=threshold,
    )
    # per-frame P went 16 -> 10; sequence = 1 + P*T
    assert ref_tokens == 1 + 10 * cfg.num_frames
    assert state.size.shape == (2 * cfg.num_frames, 10, 1)
    np.testing.assert_allclose(np.asarray(got), ref_logits, rtol=2e-3, atol=2e-3)
    if mode == "drop":
        np.testing.assert_array_equal(np.asarray(state.size), 1.0)


def test_merged_per_frame_shrinks():
    policy = MergePolicy(rs=(1, 1), mode="merge", prop_attn=True)
    model = TimeSformer(config=TINY, policy=policy)
    video = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, TINY.num_frames, 32, 32, 3)),
        dtype=jnp.float32,
    )
    params = model.init(jax.random.key(0), video)["params"]
    logits, state = model.apply({"params": params}, video)
    assert logits.shape == (1, TINY.num_classes)
    # per-frame sizes: [(B*T), P - sum(r), 1]; P=4 spatial tokens -> 2
    assert state.size.shape == (1 * TINY.num_frames, 4 - 2, 1)
    # per-frame token mass conserved
    np.testing.assert_allclose(np.asarray(state.size).sum(axis=1), 4.0)
    assert np.isfinite(np.asarray(logits)).all()


def test_image_vit_init_rule():
    """Converter clones spatial->temporal attn and zero-inits temporal_fc
    when given image-ViT-style weights (helpers:185-201)."""
    import torch

    hf = _hf_tiny()
    sd = {
        k: v
        for k, v in _hf_timesformer_to_orig_sd(hf).items()
        if "temporal" not in k
    }
    params = convert_timesformer(sd, depth=TINY.depth)
    blk = params["blocks_0"]
    np.testing.assert_array_equal(
        blk["temporal_attn"]["qkv"]["kernel"], blk["attn"]["qkv"]["kernel"]
    )
    assert np.all(blk["temporal_fc"]["kernel"] == 0)


def _hf_timesformer_to_orig_sd(hf):
    from vtm.checkpoints.convert import _hf_timesformer_to_original

    return _hf_timesformer_to_original(hf.state_dict())


def test_pos_embed_interpolation():
    import torch

    hf = _hf_tiny()
    params = convert_timesformer(
        hf.state_dict(), depth=TINY.depth, num_frames=8, spatial_tokens=16
    )
    assert params["pos_embed"].shape[1] == 17
    assert params["time_embed"].shape[1] == 8
