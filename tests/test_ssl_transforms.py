"""SSL augmentation parity vs the reference transform fns
(slowfast/datasets/transform.py:1089-1216) and the torchvision cores
the reference composes.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import load_reference_module  # noqa: E402
from vtm.data import transform as T  # noqa: E402


@pytest.fixture(scope="module")
def ref_transform():
    return load_reference_module(
        "slowfast/datasets/transform.py", "ref_slowfast_transform"
    )


@pytest.mark.parametrize("use_grayscale", [False, True])
@pytest.mark.parametrize("absolute", [False, True])
def test_temporal_difference_parity(ref_transform, use_grayscale, absolute):
    rng = np.random.default_rng(0)
    thwc = rng.uniform(0, 255, (5, 8, 6, 3)).astype(np.float32)
    # reference takes C T H W
    cthw = torch.from_numpy(thwc).permute(3, 0, 1, 2).clone()
    ref = (
        ref_transform.temporal_difference(cthw, use_grayscale, absolute)
        .permute(1, 2, 3, 0)
        .numpy()
    )
    got = T.temporal_difference(thwc, use_grayscale, absolute)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_augment_raw_frames_time_diff_draw_order(ref_transform):
    """Both sides draw the time-diff gate from python `random` — with
    the same seed the gate decisions and outputs must match exactly
    (reference transform.py:1166-1191; gaussian_prob=0 is the only
    live config)."""
    rng = np.random.default_rng(1)
    thwc = rng.uniform(0, 255, (4, 6, 5, 3)).astype(np.float32)
    for seed in range(6):
        random.seed(seed)
        ref_frames, ref_flag = ref_transform.augment_raw_frames(
            torch.from_numpy(thwc).clone(), time_diff_prob=0.5
        )
        random.seed(seed)
        got_frames, got_flag = T.augment_raw_frames(thwc, time_diff_prob=0.5)
        assert got_flag == ref_flag, seed
        np.testing.assert_allclose(
            got_frames, ref_frames.numpy(), rtol=1e-5, atol=1e-4
        )


def _clip_as_pil_pair(seed=0, t=3, h=8, w=6):
    rng = np.random.default_rng(seed)
    thwc = rng.integers(0, 256, (t, h, w, 3), dtype=np.uint8)
    return thwc


def _real_torchvision_functional():
    """torchvision is absent from this image and stubbed by conftest;
    the tv-parity comparisons only run where it's real."""
    import unittest.mock as mock

    try:
        import torchvision.transforms.functional as tvf
    except ImportError:
        pytest.skip("torchvision not installed")
    if isinstance(tvf, mock.MagicMock):
        pytest.skip("torchvision stubbed (not installed in this image)")
    return tvf


@pytest.mark.parametrize("kind", ["brightness", "contrast", "saturation", "hue"])
def test_pil_jitter_cores_match_torchvision(kind):
    """Deterministic cores (fixed factors) vs torchvision.transforms
    .functional on the same flattened clip image — the exact ops the
    reference's ColorJitter(PIL backend) applies. (Auto-skips here:
    torchvision is not in the image; the PIL-invariant tests below
    cover the cores, and brightness/contrast/saturation ARE torchvision's
    own PIL backend — ImageEnhance — by construction.)"""
    tvf = _real_torchvision_functional()
    from PIL import ImageEnhance

    thwc = _clip_as_pil_pair()
    img, _ = T._clip_to_pil(thwc)
    factor = 1.3 if kind != "hue" else 0.07
    if kind == "brightness":
        ref = tvf.adjust_brightness(img, factor)
        got = ImageEnhance.Brightness(img).enhance(factor)
    elif kind == "contrast":
        ref = tvf.adjust_contrast(img, factor)
        got = ImageEnhance.Contrast(img).enhance(factor)
    elif kind == "saturation":
        ref = tvf.adjust_saturation(img, factor)
        got = ImageEnhance.Color(img).enhance(factor)
    else:
        ref = tvf.adjust_hue(img, factor)
        got = T._pil_adjust_hue(img, factor)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grayscale3_matches_torchvision():
    tvf = _real_torchvision_functional()

    thwc = _clip_as_pil_pair(3)
    img, _ = T._clip_to_pil(thwc)
    ref = tvf.to_grayscale(img, num_output_channels=3)
    got = T._pil_grayscale3(img)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pil_core_invariants():
    """PIL-level invariants of the reimplemented cores (the parts not
    literally delegated to ImageEnhance): hue shift semantics + 3-chan
    grayscale."""
    from PIL import Image

    thwc = _clip_as_pil_pair(7)
    img, _ = T._clip_to_pil(thwc)
    # hue_factor 0 writes through the HSV round-trip only
    h, s, v = img.convert("HSV").split()
    expect = Image.merge("HSV", (h, s, v)).convert("RGB")
    got = T._pil_adjust_hue(img, 0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
    # a nonzero shift changes hues (on non-gray pixels) and the result
    # round-trips through RGB without dims/dtype drift
    shifted = T._pil_adjust_hue(img, 0.25)
    assert shifted.size == img.size and shifted.mode == img.mode
    assert not np.array_equal(np.asarray(shifted), np.asarray(got))
    # grayscale: ITU-R 601 luma replicated across channels
    g = np.asarray(T._pil_grayscale3(img))
    assert np.array_equal(g[..., 0], g[..., 1]) and np.array_equal(
        g[..., 1], g[..., 2]
    )
    lum = np.asarray(img.convert("L"))
    np.testing.assert_array_equal(g[..., 0], lum)


def test_color_jitter_video_ssl_shapes_and_gates():
    thwc = _clip_as_pil_pair(5, t=4, h=10, w=7)
    # p_convert_gray=1 forces grayscale in the non-moco pipeline
    rng = random.Random(0)
    out = T.color_jitter_video_ssl(
        thwc, bri_con_sat=(0.0, 0.0, 0.0), hue=0.0, p_convert_gray=1.0, rng=rng
    )
    assert out.shape == thwc.shape and out.dtype == np.uint8
    assert np.array_equal(out[..., 0], out[..., 1])  # grayscale channels
    # moco pipeline, all gates on: output differs from input but stays valid
    rng = random.Random(1)
    out2 = T.color_jitter_video_ssl(
        thwc, moco_v2_aug=True, p_convert_gray=0.0, rng=rng
    )
    assert out2.shape == thwc.shape
    assert not np.array_equal(out2, thwc)
    # two different seeds give different views (the MoCo requirement)
    out3 = T.color_jitter_video_ssl(
        thwc, moco_v2_aug=True, p_convert_gray=0.0, rng=random.Random(2)
    )
    assert not np.array_equal(out2, out3)


def test_kinetics_ssl_wiring_produces_distinct_views(tmp_path, monkeypatch):
    """End-to-end: with SSL_COLOR_JITTER + TRAIN_CROP_NUM_TEMPORAL=2
    the kinetics item carries two views whose color stats differ (the
    MoCo two-crops requirement that round 3 lacked)."""
    import cv2

    from vtm.config import get_cfg
    from vtm.data.kinetics import Kinetics

    # tiny synthetic video
    vid = tmp_path / "v.avi"
    wr = cv2.VideoWriter(
        str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 64)
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    for i in range(48):
        wr.write(np.roll(base, i, axis=1))
    wr.release()
    (tmp_path / "train.csv").write_text(f"{vid} 0\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = ""
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 48]
    cfg.DATA.TRAIN_CROP_NUM_TEMPORAL = 2
    cfg.DATA.SSL_COLOR_JITTER = True
    cfg.DATA.SSL_MOCOV2_AUG = True
    cfg.DATA.COLOR_RND_GRAYSCALE = 0.2
    cfg.DATA.TIME_DIFF_PROB = 0.0

    ds = Kinetics(cfg, "train")
    random.seed(0)
    item = ds[0]
    clips = item["clips"]
    assert clips.shape[0] == 2
    # views must be differently augmented, not just differently cropped:
    # per-channel means differ beyond crop noise for a rolled texture
    m0 = clips[0].mean(axis=(0, 1, 2))
    m1 = clips[1].mean(axis=(0, 1, 2))
    assert not np.allclose(m0, m1, atol=1e-4)


def test_time_diff_flows_through_decode(monkeypatch, tmp_path):
    """decode(time_diff_prob=1) applies the (dt+255)/2 transform to the
    RAW decoded window BEFORE temporal sampling (reference
    decoder.py:630-648 augments the decoded video, then samples), so
    differences are between consecutive raw frames, not sampled ones."""
    import math

    import cv2

    from vtm.data import decoder

    vid = tmp_path / "v.avi"
    wr = cv2.VideoWriter(
        str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 30, (32, 32)
    )
    rng = np.random.default_rng(0)
    for i in range(40):
        wr.write(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    wr.release()

    random.seed(0)
    plain = decoder.decode(str(vid), 2, 4, clip_idx=0, num_clips=1)
    random.seed(0)
    auged = decoder.decode(
        str(vid), 2, 4, clip_idx=0, num_clips=1, time_diff_prob=1.0
    )
    assert plain.dtype == np.uint8 and auged.dtype == np.float32

    # replicate decode's fast path: aug the raw window, THEN sample
    fps, total = decoder._video_meta(str(vid))
    clip_size = 2 * 4 / 30 * fps
    start_idx, end_idx, _ = decoder.get_start_end_idx(total, clip_size, 0, 1)
    first = int(math.floor(max(start_idx, 0)))
    last = min(int(math.ceil(end_idx)), total - 1)
    window, first = decoder.read_video_window_cv2(str(vid), first, last)
    expect, applied = T.augment_raw_frames(window, time_diff_prob=1.0)
    assert applied
    index = np.linspace(start_idx, end_idx, 4)
    index = np.clip(index, 0, total - 1).astype(np.int64) - first
    index = np.clip(index, 0, expect.shape[0] - 1)
    np.testing.assert_allclose(auged, expect[index], atol=1e-4)

    # guard the ordering: aug-after-sampling would differ (consecutive
    # sampled frames are 2 raw frames apart here)
    after, _ = T.augment_raw_frames(plain, time_diff_prob=1.0)
    assert not np.allclose(auged, after, atol=1e-2)


def test_time_diff_with_randaugment_train_path(tmp_path):
    """TIME_DIFF_PROB + AUG.AA_TYPE with SSL_COLOR_JITTER off: the
    float time-difference clip must flow through RandAugment (the
    reference's unconditional .float()/255 at kinetics.py:412-413
    feeds [0,1] floats into the AA ToPILImage path)."""
    import cv2

    from vtm.config import get_cfg
    from vtm.data.kinetics import Kinetics

    vid_path = tmp_path / "v0.avi"
    w = cv2.VideoWriter(
        str(vid_path), cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48)
    )
    rng = np.random.default_rng(0)
    for _ in range(40):
        w.write(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
    w.release()
    (tmp_path / "train.csv").write_text(f"{vid_path} 1\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [32, 40]
    cfg.DATA.TIME_DIFF_PROB = 1.0
    cfg.AUG.ENABLE = True
    cfg.AUG.AA_TYPE = "rand-m7-n4-mstd0.5-inc1"

    random.seed(0)
    item = Kinetics(cfg, "train")[0]
    frames = np.asarray(item["frames"])
    assert frames.shape == (4, 32, 32, 3)
    assert frames.dtype == np.float32
    assert np.isfinite(frames).all()


def test_kinetics_unconditional_float_scale_matches_uint8_path(tmp_path):
    """The unconditional /255 before the aug chain is value-preserving
    for plain uint8 clips (no SSL/AA/time-diff): test-mode output must
    equal tensor_normalize(uint8)'s result exactly."""
    import cv2

    from vtm.config import get_cfg
    from vtm.data.kinetics import Kinetics

    vid_path = tmp_path / "v0.avi"
    w = cv2.VideoWriter(
        str(vid_path), cv2.VideoWriter_fourcc(*"MJPG"), 30, (32, 32)
    )
    rng = np.random.default_rng(1)
    for _ in range(40):
        w.write(rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))
    w.release()
    (tmp_path / "test.csv").write_text(f"{vid_path} 1\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32
    # single-crop test scales the short side to TRAIN_JITTER_SCALES[0]
    # — pin it to the video size so no interpolation occurs
    cfg.DATA.TRAIN_JITTER_SCALES = [32, 32]
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1

    item = Kinetics(cfg, "test")[0]
    frames = np.asarray(item["frames"])
    mean = np.asarray(cfg.DATA.MEAN, np.float32)
    std = np.asarray(cfg.DATA.STD, np.float32)
    # invert the normalization: recovered pixels must be exact /255
    # multiples of integers (the unconditional float path kept them)
    recovered = frames * std + mean
    ints = recovered * 255.0
    np.testing.assert_allclose(ints, np.round(ints), atol=1e-3)
