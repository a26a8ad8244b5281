"""VideoMAE golden tests: converted HF weights must reproduce HF torch
logits; merged forward must match a handcrafted torch oracle that uses
the reference merge implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtm.checkpoints.convert import convert_videomae
from vtm.merge.policy import MergePolicy
from vtm.models.videomae import VideoMAE, VideoMAEConfig

TINY = dict(
    img_size=32,
    patch_size=16,
    num_frames=4,
    tubelet_size=2,
    embed_dim=32,
    depth=2,
    num_heads=2,
    mlp_ratio=2.0,
    qkv_bias=True,
    use_mean_pooling=True,
)


def _hf_tiny(num_labels=7):
    torch = pytest.importorskip("torch")
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEForVideoClassification

    torch.manual_seed(0)
    hf = VideoMAEForVideoClassification(
        HFConfig(
            image_size=TINY["img_size"],
            patch_size=TINY["patch_size"],
            num_frames=TINY["num_frames"],
            tubelet_size=TINY["tubelet_size"],
            hidden_size=TINY["embed_dim"],
            num_hidden_layers=TINY["depth"],
            num_attention_heads=TINY["num_heads"],
            intermediate_size=int(TINY["embed_dim"] * TINY["mlp_ratio"]),
            num_labels=num_labels,
            use_mean_pooling=True,
        )
    ).eval()
    return hf


def test_unmerged_logits_match_hf():
    import torch

    hf = _hf_tiny()
    params = convert_videomae(hf.state_dict(), depth=TINY["depth"])
    model = VideoMAE(config=VideoMAEConfig(num_classes=7, **TINY))

    rng = np.random.default_rng(0)
    video = rng.standard_normal(
        (2, TINY["num_frames"], TINY["img_size"], TINY["img_size"], 3)
    ).astype(np.float32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(video).permute(0, 1, 4, 2, 3)).logits.numpy()

    with jax.default_matmul_precision("highest"):
        got, _ = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_merged_forward_matches_torch_oracle(ref_merge):
    """Full ToMe block semantics (metric=k.mean, prop-attn size bias,
    merge between attn and MLP — reference tome/patch/videomae.py:13-77)
    against a torch oracle built from the same weights + the reference
    merge implementation."""
    import torch
    import torch.nn.functional as F

    hf = _hf_tiny()
    sd = {k: v for k, v in hf.state_dict().items()}
    params = convert_videomae(sd, depth=TINY["depth"])
    policy = MergePolicy(rs=(1, 1), mode="merge", prop_attn=True)
    model = VideoMAE(config=VideoMAEConfig(num_classes=7, **TINY), policy=policy)

    rng = np.random.default_rng(1)
    video = rng.standard_normal(
        (2, TINY["num_frames"], TINY["img_size"], TINY["img_size"], 3)
    ).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        got, state = model.apply({"params": params}, jnp.asarray(video))

    # ---- torch oracle -------------------------------------------------
    def t(key):
        return sd[key]

    with torch.no_grad():
        v = torch.from_numpy(video).permute(0, 4, 1, 2, 3)  # B,C,T,H,W
        x = F.conv3d(
            v,
            t("videomae.embeddings.patch_embeddings.projection.weight"),
            t("videomae.embeddings.patch_embeddings.projection.bias"),
            stride=(TINY["tubelet_size"], TINY["patch_size"], TINY["patch_size"]),
        )
        x = x.flatten(2).transpose(1, 2)
        from vtm.models.common import sinusoid_encoding_table

        x = x + torch.from_numpy(
            sinusoid_encoding_table(x.shape[1], TINY["embed_dim"])
        )
        size = None
        H = TINY["num_heads"]
        for i in range(TINY["depth"]):
            pre = f"videomae.encoder.layer.{i}"
            xn = F.layer_norm(
                x,
                (TINY["embed_dim"],),
                t(f"{pre}.layernorm_before.weight"),
                t(f"{pre}.layernorm_before.bias"),
                eps=1e-12,
            )
            B, N, C = xn.shape
            q = F.linear(xn, t(f"{pre}.attention.attention.query.weight"), t(f"{pre}.attention.attention.q_bias"))
            k = F.linear(xn, t(f"{pre}.attention.attention.key.weight"))
            vv = F.linear(xn, t(f"{pre}.attention.attention.value.weight"), t(f"{pre}.attention.attention.v_bias"))
            q, k, vv = (z.view(B, N, H, C // H).transpose(1, 2) for z in (q, k, vv))
            attn = q @ k.transpose(-2, -1) * (C // H) ** -0.5
            if size is not None:
                attn = attn + size.log()[:, None, None, :, 0]
            attn = attn.softmax(-1)
            ctx = (attn @ vv).transpose(1, 2).reshape(B, N, C)
            ctx = F.linear(ctx, t(f"{pre}.attention.output.dense.weight"), t(f"{pre}.attention.output.dense.bias"))
            x = x + ctx
            metric = k.mean(1)
            mfn, _ = ref_merge.bipartite_soft_matching(metric, 1, class_token=False)
            x, size = ref_merge.merge_wavg(mfn, x, size)
            xn2 = F.layer_norm(
                x,
                (TINY["embed_dim"],),
                t(f"{pre}.layernorm_after.weight"),
                t(f"{pre}.layernorm_after.bias"),
                eps=1e-12,
            )
            h1 = F.gelu(F.linear(xn2, t(f"{pre}.intermediate.dense.weight"), t(f"{pre}.intermediate.dense.bias")))
            x = x + F.linear(h1, t(f"{pre}.output.dense.weight"), t(f"{pre}.output.dense.bias"))
        feats = F.layer_norm(
            x.mean(1), (TINY["embed_dim"],), t("fc_norm.weight"), t("fc_norm.bias"), eps=1e-12
        )
        ref_logits = F.linear(feats, t("classifier.weight"), t("classifier.bias")).numpy()

    assert np.asarray(got).shape == ref_logits.shape
    np.testing.assert_allclose(np.asarray(got), ref_logits, rtol=2e-3, atol=2e-3)
    # tokens actually shrank: 8 -> 6
    assert int(state.size.shape[1]) == 8 - 2


def test_merge_modes_run_and_shrink():
    cfgs = [
        MergePolicy(rs=(1, 1), mode="drop"),
        MergePolicy(rs=(1, 1), mode="hybrid", threshold=0.0),
        MergePolicy(rs=(1, 1), mode="random_merge"),
        MergePolicy(rs=(1, 1), mode="random_drop"),
    ]
    video = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 4, 32, 32, 3)), dtype=jnp.float32
    )
    for policy in cfgs:
        model = VideoMAE(config=VideoMAEConfig(num_classes=3, **TINY), policy=policy)
        params = model.init(jax.random.key(0), video, rng=jax.random.key(1))["params"]
        logits, state = model.apply(
            {"params": params}, video, rng=jax.random.key(2)
        )
        assert logits.shape == (1, 3)
        assert np.isfinite(np.asarray(logits)).all(), policy.mode


@pytest.mark.parametrize(
    "mode,threshold",
    [("drop", 0.0), ("hybrid", 0.0), ("hybrid", 0.8)],
)
def test_mode_forward_matches_torch_oracle(ref_merge, mode, threshold):
    """In-model numeric parity for the ablation modes (reference
    videomae_{drop,hybrid}, tome/patch/videomae.py:103-151): drop must
    discard tokens and RESET size to ones; hybrid must zero
    sub-threshold destination slots before the weighted merge-sum. The
    merge-mode equivalent lives in test_merged_forward_matches_torch_oracle;
    modes here were previously only smoke-tested in-model."""
    import torch  # noqa: F401  (oracle runs under torch)

    from torch_oracles import videomae_tome_forward

    cfg = dict(TINY, img_size=64)  # 32 tokens -> meaningful r=6 merges
    hf_kwargs = dict(
        image_size=cfg["img_size"],
        patch_size=cfg["patch_size"],
        num_frames=cfg["num_frames"],
        tubelet_size=cfg["tubelet_size"],
        hidden_size=cfg["embed_dim"],
        num_hidden_layers=cfg["depth"],
        num_attention_heads=cfg["num_heads"],
        intermediate_size=int(cfg["embed_dim"] * cfg["mlp_ratio"]),
        num_labels=7,
        use_mean_pooling=True,
    )
    torch = pytest.importorskip("torch")
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEForVideoClassification

    torch.manual_seed(3)
    hf = VideoMAEForVideoClassification(HFConfig(**hf_kwargs)).eval()
    sd = dict(hf.state_dict())
    params = convert_videomae(sd, depth=cfg["depth"])

    policy = MergePolicy(
        rs=(6, 6), mode=mode, threshold=threshold, prop_attn=True
    )
    model = VideoMAE(config=VideoMAEConfig(num_classes=7, **cfg), policy=policy)

    rng = np.random.default_rng(4)
    video = rng.standard_normal(
        (2, cfg["num_frames"], cfg["img_size"], cfg["img_size"], 3)
    ).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        got, state = model.apply({"params": params}, jnp.asarray(video))

    ref_logits, n_final = videomae_tome_forward(
        sd, video, rs=[6, 6], ref_merge=ref_merge,
        depth=cfg["depth"], heads=cfg["num_heads"],
        embed_dim=cfg["embed_dim"], tubelet=cfg["tubelet_size"],
        patch=cfg["patch_size"], prop_attn=True,
        mode=mode, threshold=threshold,
    )
    np.testing.assert_allclose(np.asarray(got), ref_logits, rtol=2e-3, atol=2e-3)
    assert int(state.size.shape[1]) == n_final == 32 - 12
    if mode == "drop":
        np.testing.assert_array_equal(np.asarray(state.size), 1.0)


def test_trace_source_shape():
    policy = MergePolicy(rs=(1, 1), mode="merge", trace_source=True)
    model = VideoMAE(config=VideoMAEConfig(num_classes=3, **TINY), policy=policy)
    video = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 32, 32, 3)), dtype=jnp.float32
    )
    params = model.init(jax.random.key(0), video)["params"]
    _, state = model.apply({"params": params}, video)
    assert state.source.shape == (1, 6, 8)  # [B, n_final, n_initial]
    # every original token belongs to exactly one group
    assert np.asarray(state.source).sum(axis=1).max() == 1.0
