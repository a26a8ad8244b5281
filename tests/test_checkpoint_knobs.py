"""Generic checkpoint-load knobs (reference checkpoint.py:152-190,
326-339, 343-460; misc.frozen_bn_stats): CLEAR_NAME_PATTERN renames,
2D->3D inflation, image-init surgeries, FROZEN_BN.
"""

from __future__ import annotations

import numpy as np
import pytest

from vtm.checkpoints.checkpoint import (
    _interp_linear,
    clear_name_pattern_keys,
    image_init_adapt,
    inflate_weights,
    merge_into_template,
)


def test_clear_name_pattern_first_occurrence_only():
    sd = {
        "backbone.blocks.0.w": 1,
        "backbone.backbone_proj.w": 2,
        "head.w": 3,
    }
    out = clear_name_pattern_keys(sd, ("backbone.",))
    assert set(out) == {"blocks.0.w", "backbone_proj.w", "head.w"}
    # sequential patterns apply in order
    out2 = clear_name_pattern_keys(sd, ("backbone.", "blocks."))
    assert "0.w" in out2


def test_inflate_2d_into_3d_conv():
    """A 2-D ResNet state inflates into the 3-D conv family: (h,w,i,o)
    kernels repeat over t and divide by t (I3D bootstrap), so the 3-D
    conv's response on a temporally-constant input matches the 2-D
    conv's (reference inflate_weight:152-190)."""
    rng = np.random.default_rng(0)
    k2d = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    template = {
        "conv": {"kernel": np.zeros((5, 3, 3, 4, 8), np.float32)},
        "bn": {"scale": np.zeros((8,), np.float32)},
        "other": {"w": np.zeros((2, 2), np.float32)},
    }
    converted = {
        "conv": {"kernel": k2d},
        "bn": {"scale": np.ones((8,), np.float32)},
        "other": {"w": np.zeros((7, 7), np.float32)},  # mismatch -> init
    }
    out = inflate_weights(converted, template)
    assert out["conv"]["kernel"].shape == (5, 3, 3, 4, 8)
    np.testing.assert_allclose(
        out["conv"]["kernel"].sum(axis=0), k2d, rtol=1e-6
    )
    np.testing.assert_allclose(out["bn"]["scale"], 1.0)
    # mismatched leaves pass through UNCHANGED (the reference logs
    # "Unexpected" and drops) so merge_into_template's loaded/kept-init
    # accounting stays faithful
    assert out["other"]["w"].shape == (7, 7)

    merged, loaded, kept = merge_into_template(template, out)
    assert loaded == 2 and kept == 1
    assert merged["other"]["w"].shape == (2, 2)  # kept template init
    np.testing.assert_allclose(merged["bn"]["scale"], 1.0)


def test_image_init_adapt_repeats_and_interpolates():
    rng = np.random.default_rng(1)
    patch2d = rng.standard_normal((16, 16, 3, 96)).astype(np.float32)
    pool1t = rng.standard_normal((1, 3, 3, 1, 96)).astype(np.float32)
    relpos = rng.standard_normal((13, 64)).astype(np.float32)
    converted = {
        "patch_embed": {"kernel": patch2d},
        "blocks_0": {"attn": {"pool_q_mod": {"kernel": pool1t},
                              "rel_pos_h": relpos}},
    }
    template = {
        "patch_embed": {"kernel": np.zeros((2, 16, 16, 3, 96), np.float32)},
        "blocks_0": {"attn": {"pool_q_mod": {"kernel": np.zeros((3, 3, 3, 1, 96), np.float32)},
                              "rel_pos_h": np.zeros((27, 64), np.float32)}},
    }
    out = image_init_adapt(converted, template)
    # patch kernel: repeated WITHOUT /t (reference image_init quirk)
    np.testing.assert_allclose(out["patch_embed"]["kernel"][0], patch2d)
    np.testing.assert_allclose(out["patch_embed"]["kernel"][1], patch2d)
    # pool kernel: time-1 -> time-3 repeat
    got_pool = out["blocks_0"]["attn"]["pool_q_mod"]["kernel"]
    assert got_pool.shape == (3, 3, 3, 1, 96)
    np.testing.assert_allclose(got_pool[2], pool1t[0])
    # rel_pos: linear interpolation to the template length
    got_rel = out["blocks_0"]["attn"]["rel_pos_h"]
    assert got_rel.shape == (27, 64)
    assert np.isfinite(got_rel).all()


def test_interp_linear_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    arr = rng.standard_normal((13, 5)).astype(np.float32)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(arr).reshape(1, 13, -1).permute(0, 2, 1),
            size=27,
            mode="linear",
        )
        .permute(0, 2, 1)
        .reshape(27, 5)
        .numpy()
    )
    got = _interp_linear(arr, 27)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_frozen_bn_keeps_running_stats():
    """MODEL.FROZEN_BN: during train the BN normalizes with running
    stats and does not update them; affine params still exist."""
    import jax
    import jax.numpy as jnp

    from vtm.models.convnet import BatchNorm, NormSpec

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 2, 4, 4, 8)), jnp.float32)

    bn_frozen = BatchNorm(NormSpec(frozen=True))
    v = bn_frozen.init(jax.random.key(0), x, train=True)
    y, mutated = bn_frozen.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        np.asarray(v["batch_stats"]["mean"]),
    )
    # normalized with the (zero-mean, unit-var) running stats
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    bn = BatchNorm(NormSpec())
    v2 = bn.init(jax.random.key(0), x, train=True)
    _, mutated2 = bn.apply(v2, x, train=True, mutable=["batch_stats"])
    assert not np.allclose(
        np.asarray(mutated2["batch_stats"]["mean"]),
        np.asarray(v2["batch_stats"]["mean"]),
    )
