"""Visualisation parity vs the reference tome/vis.py oracle."""

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="session")
def ref_vis():
    from conftest import load_reference_module

    return load_reference_module("tome/vis.py", "ref_vis")


def _fake_source(rng, n_final, n_init):
    """Random valid adjacency: every initial token in exactly one group,
    every group non-empty where possible."""
    src = np.zeros((n_final, n_init), dtype=np.float32)
    assign = rng.integers(0, n_final, size=n_init)
    assign[:n_final] = np.arange(n_final)
    src[assign, np.arange(n_init)] = 1.0
    return src


def test_make_visualization_matches_reference(ref_vis):
    import torch

    from vtm.vis import make_visualization

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8))
    src = _fake_source(rng, 6, 17)[None]  # 16 patches + cls
    ref = np.array(
        ref_vis.make_visualization(img, torch.from_numpy(src), patch_size=16)
    )
    got = np.array(make_visualization(img, src, patch_size=16))
    np.testing.assert_array_equal(got, ref)


def test_spatiotemporal_matches_reference(ref_vis):
    import torch

    from vtm.vis import make_spatiotemporal_video_visualization

    rng = np.random.default_rng(1)
    video = rng.random((4, 3, 32, 32)).astype(np.float32)
    # 2x2 spatial x 2 temporal = 8 tokens, no cls
    src = _fake_source(rng, 3, 8)[None]
    ref, _ = ref_vis.make_spatiotemporal_video_visualization(
        torch.from_numpy(video), torch.from_numpy(src), class_token=False
    )
    got, _ = make_spatiotemporal_video_visualization(video, src, class_token=False)
    np.testing.assert_array_equal(got, ref)


def test_spatial_video_matches_reference(ref_vis):
    import torch

    from vtm.vis import make_spatial_video_visualization

    rng = np.random.default_rng(2)
    video = rng.random((4, 3, 32, 32)).astype(np.float32)
    # per-folded-frame sources: 2 folded frames, 4 spatial tokens + cls
    src = np.stack([_fake_source(rng, 2, 5) for _ in range(2)])
    ref = ref_vis.make_spatial_video_visualization(
        torch.from_numpy(video), torch.from_numpy(src), class_token=True
    )
    got = make_spatial_video_visualization(video, src, class_token=True)
    np.testing.assert_array_equal(got, ref)


def test_concatenate_images(ref_vis):
    from vtm.vis import concatenate_images

    rng = np.random.default_rng(3)
    video = rng.integers(0, 255, size=(8, 16, 16, 3), dtype=np.uint8)
    ref = ref_vis.concatenate_images(video, ncols=4, nrows=2)
    got = concatenate_images(video, ncols=4, nrows=2)
    np.testing.assert_array_equal(np.array(got), np.array(ref))


def test_hybrid_dropped_group(ref_vis):
    """Empty source columns (hybrid-dropped tokens) map to the extra
    group (reference vis.py:148)."""
    import torch

    from vtm.vis import make_spatiotemporal_video_visualization

    rng = np.random.default_rng(4)
    video = rng.random((4, 3, 32, 32)).astype(np.float32)
    src = _fake_source(rng, 3, 8)[None].copy()
    src[0, :, 5] = 0.0  # token 5 dropped
    ref, _ = ref_vis.make_spatiotemporal_video_visualization(
        torch.from_numpy(video), torch.from_numpy(src), class_token=False
    )
    got, _ = make_spatiotemporal_video_visualization(video, src, class_token=False)
    np.testing.assert_array_equal(got, ref)
