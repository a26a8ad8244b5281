"""Data pipeline: transforms parity vs reference math, loader collation,
synthetic dataset, kinetics csv handling."""

import numpy as np
import pytest

from vtm.config import get_cfg
from vtm.data import construct_loader
from vtm.data.decoder import get_start_end_idx, temporal_sampling
from vtm.data.transform import spatial_sampling, tensor_normalize, uniform_crop


@pytest.fixture(scope="session")
def ref_transform():
    from conftest import load_reference_module

    return load_reference_module("slowfast/datasets/transform.py", "ref_transform")


def test_uniform_crop_matches_reference(ref_transform):
    import torch

    rng = np.random.default_rng(0)
    frames = rng.random((3, 120, 160, 3)).astype(np.float32)
    for idx in (0, 1, 2):
        ref, _ = ref_transform.uniform_crop(
            torch.from_numpy(frames).permute(0, 3, 1, 2), 100, idx
        )
        got = uniform_crop(frames, 100, idx)
        np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy())


def test_get_start_end_idx_matches_reference():
    from conftest import load_reference_module

    ref_decoder = load_reference_module("slowfast/datasets/decoder.py", "ref_decoder")
    for video_size, clip_size, clip_idx, num_clips in [
        (300, 64, 0, 10),
        (300, 64, 9, 10),
        (300, 64, 2, 5),
        (50, 64, 0, 1),
        (100, 32.5, 3, 7),
    ]:
        ref = ref_decoder.get_start_end_idx(video_size, clip_size, clip_idx, num_clips)
        got = get_start_end_idx(video_size, clip_size, clip_idx, num_clips)
        assert got == tuple(ref)


def test_get_multiple_start_end_idx_matches_reference():
    """Multi-clip window sampling with gap constraints
    (reference decoder.py:81-185), deterministic and seeded-random."""
    import math
    import random

    from conftest import load_reference_module
    from vtm.data.decoder import get_multiple_start_end_idx

    ref_decoder = load_reference_module("slowfast/datasets/decoder.py", "ref_decoder")

    cases = [
        # (video_size, clip_sizes, clip_idx, num_clips, min_d, max_d, offset)
        (300, [64], 0, 10, 0, math.inf, False),
        (300, [64, 32], 3, 10, 0, math.inf, False),
        (300, [64, 32, 16], 9, 10, 0, math.inf, True),
        (100, [32.5, 12], 2, 5, 0, math.inf, False),
        (50, [64, 32], 0, 1, 0, math.inf, True),
    ]
    for vs, cs, ci, nc, mind, maxd, off in cases:
        ref = ref_decoder.get_multiple_start_end_idx(vs, cs, ci, nc, mind, maxd, off)
        got = get_multiple_start_end_idx(vs, cs, ci, nc, mind, maxd, off)
        np.testing.assert_allclose(got, np.asarray(ref))

    # random sampling draws via the global `random` module in the same
    # order, including the constraint-retry loops
    for seed, (mind, maxd) in [(0, (0, math.inf)), (1, (10, 200)), (2, (120, 130))]:
        random.seed(seed)
        ref = ref_decoder.get_multiple_start_end_idx(300, [64, 32], -1, 10, mind, maxd)
        random.seed(seed)
        got = get_multiple_start_end_idx(300, [64, 32], -1, 10, mind, maxd)
        np.testing.assert_allclose(got, np.asarray(ref))


def test_temporal_sampling_matches_reference():
    from conftest import load_reference_module
    import torch

    ref_decoder = load_reference_module("slowfast/datasets/decoder.py", "ref_decoder")
    frames = np.arange(60, dtype=np.float32).reshape(60, 1, 1, 1)
    ref = ref_decoder.temporal_sampling(torch.from_numpy(frames), 3.2, 41.7, 8)
    got = temporal_sampling(frames, 3.2, 41.7, 8)
    np.testing.assert_allclose(got, ref.numpy())


def test_random_resized_crop_matches_reference(ref_transform):
    """Crop geometry + bilinear resize parity for the finetune recipe's
    RandomResizedCrop (reference transform.py:502-576), seeded."""
    import random

    import torch

    rng = np.random.default_rng(3)
    frames = rng.random((4, 120, 160, 3)).astype(np.float32)
    from vtm.data.transform import random_resized_crop

    for seed in range(5):
        random.seed(seed)
        np.random.seed(seed)
        ref = ref_transform.random_resized_crop(
            torch.from_numpy(frames).permute(3, 0, 1, 2),  # C T H W
            96, 112, scale=(0.5, 1.0), ratio=(0.75, 1.3333),
        )
        random.seed(seed)
        np.random.seed(seed)
        got = random_resized_crop(frames, 96, 112, scale=(0.5, 1.0), ratio=(0.75, 1.3333))
        np.testing.assert_allclose(
            got, ref.permute(1, 2, 3, 0).numpy(), rtol=1e-4, atol=1e-4
        )


def test_random_resized_crop_with_shift_matches_reference(ref_transform):
    import random

    import torch

    rng = np.random.default_rng(4)
    frames = rng.random((6, 120, 160, 3)).astype(np.float32)
    from vtm.data.transform import random_resized_crop_with_shift

    for seed in range(5):
        random.seed(seed)
        np.random.seed(seed)
        ref = ref_transform.random_resized_crop_with_shift(
            torch.from_numpy(frames).permute(3, 0, 1, 2),
            96, 96, scale=(0.5, 1.0), ratio=(0.75, 1.3333),
        )
        random.seed(seed)
        np.random.seed(seed)
        got = random_resized_crop_with_shift(frames, 96, 96, scale=(0.5, 1.0), ratio=(0.75, 1.3333))
        np.testing.assert_allclose(
            got, ref.permute(1, 2, 3, 0).numpy(), rtol=1e-4, atol=1e-4
        )


def test_color_jitter_matches_reference(ref_transform):
    import torch

    rng = np.random.default_rng(5)
    frames = rng.random((3, 24, 24, 3)).astype(np.float32)
    from vtm.data.transform import color_jitter

    for seed in range(4):
        np.random.seed(seed)
        ref = ref_transform.color_jitter(
            torch.from_numpy(frames).permute(0, 3, 1, 2),  # T C H W
            img_brightness=0.4, img_contrast=0.3, img_saturation=0.2,
        )
        np.random.seed(seed)
        got = color_jitter(frames, 0.4, 0.3, 0.2)
        np.testing.assert_allclose(
            got, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5
        )


def test_relative_crop_wired_into_train_pipeline(tmp_path):
    """The tome_train AUG keys (TRAIN_JITTER_SCALES_RELATIVE /
    ASPECT_RELATIVE) must route the train path through
    RandomResizedCrop: output is crop_size and differs from the
    scale-jitter path under the same seed."""
    import random

    from vtm.data.transform import relative_crop_args, spatial_sampling

    cfg = get_cfg()
    cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE = [0.5, 1.0]
    cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE = [0.75, 1.3333]
    args = relative_crop_args(cfg, "train")
    assert args["scale"] == [0.5, 1.0] and args["aspect_ratio"] == [0.75, 1.3333]
    assert relative_crop_args(cfg, "test")["scale"] is None

    rng = np.random.default_rng(6)
    frames = rng.random((2, 120, 160, 3)).astype(np.float32)
    random.seed(0)
    np.random.seed(0)
    out = spatial_sampling(
        frames, spatial_idx=-1, min_scale=96, max_scale=120, crop_size=96,
        random_horizontal_flip=False, **args,
    )
    assert out.shape == (2, 96, 96, 3)


def test_tensor_normalize():
    frames = np.full((1, 2, 2, 3), 255, dtype=np.uint8)
    out = tensor_normalize(frames, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
    np.testing.assert_allclose(out, 2.0)


def test_spatial_sampling_test_mode_deterministic():
    rng = np.random.default_rng(1)
    frames = rng.random((2, 140, 180, 3)).astype(np.float32)
    a = spatial_sampling(frames, spatial_idx=1, min_scale=128, max_scale=128, crop_size=112)
    b = spatial_sampling(frames, spatial_idx=1, min_scale=128, max_scale=128, crop_size=112)
    assert a.shape == (2, 112, 112, 3)
    np.testing.assert_array_equal(a, b)


def test_synthetic_loader_collation():
    cfg = get_cfg()
    cfg.TEST.DATASET = "synthetic"
    cfg.TEST.BATCH_SIZE = 4
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TEST_CROP_SIZE = 16
    loader = construct_loader(cfg, "test")
    n_clips = 0
    for batch in loader:
        assert batch["frames"].ndim == 5 and batch["frames"].shape[1:] == (2, 16, 16, 3)
        assert batch["label"].shape == batch["index"].shape
        n_clips += batch["frames"].shape[0]
    assert n_clips == len(loader.dataset)
    # same video id -> identical frames across views (deterministic)
    d = loader.dataset
    assert np.array_equal(d[0]["frames"], d[1]["frames"])
    assert not np.array_equal(d[0]["frames"], d[2]["frames"])


def test_kinetics_csv(tmp_path):
    # synthesize a tiny video with cv2 and a csv pointing at it
    import cv2

    vid_path = tmp_path / "v0.avi"
    w = cv2.VideoWriter(
        str(vid_path), cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48)
    )
    rng = np.random.default_rng(0)
    for _ in range(48):
        w.write(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
    w.release()
    (tmp_path / "test.csv").write_text(f"{vid_path} 3\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    from vtm.data.kinetics import Kinetics

    ds = Kinetics(cfg, "test")
    assert len(ds) == 6  # 1 video x 2 views x 3 crops
    item = ds[0]
    assert item["frames"].shape == (4, 32, 32, 3)
    assert item["label"] == 3


def test_selective_decode_matches_full_read(tmp_path):
    """The grab-skip window decode must produce the same clip as the
    full-read + temporal_sampling path."""
    cv2 = pytest.importorskip("cv2")
    from vtm.data import decoder

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(60):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()

    for clip_idx in (0, 2, 4):
        got = decoder.decode(path, 4, 8, clip_idx=clip_idx, num_clips=5)
        frames, fps = decoder.read_video_cv2(path)
        clip_size = 4 * 8 / 30 * fps
        s, e, _ = decoder.get_start_end_idx(frames.shape[0], clip_size, clip_idx, 5)
        ref = decoder.temporal_sampling(frames, s, e, 8)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("src_fps", [12, 24, 30, 60])
def test_decode_fps_retarget(tmp_path, src_fps):
    """Source fps != target 30 must stretch/shrink the clip window like
    the reference pyav path (decoder.py:378-489): clip_size scales by
    fps/target_fps, so the sampled WALL-CLOCK span is fps-invariant."""
    cv2 = pytest.importorskip("cv2")
    from vtm.data import decoder

    path = str(tmp_path / f"clip{src_fps}.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), src_fps, (32, 32))
    rng = np.random.default_rng(1)
    # encode 4 seconds of video at the source fps
    for _ in range(4 * src_fps):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()

    got = decoder.decode(path, 4, 8, clip_idx=1, num_clips=3)
    assert got is not None and got.shape == (8, 32, 32, 3)

    frames, fps = decoder.read_video_cv2(path)
    assert abs(fps - src_fps) < 0.5, "metadata fps sanity"
    clip_size = 4 * 8 / 30 * fps  # retargeted window length in frames
    s, e, _ = decoder.get_start_end_idx(frames.shape[0], clip_size, 1, 3)
    ref = decoder.temporal_sampling(frames, s, e, 8)
    np.testing.assert_array_equal(got, ref)


def test_decode_lying_framecount_metadata(tmp_path, monkeypatch):
    """K400 mp4s lie about their frame count; when the window decode
    comes up short against the metadata, decode() must fall back to the
    full-read path and still return a clip."""
    cv2 = pytest.importorskip("cv2")
    from vtm.data import decoder

    path = str(tmp_path / "liar.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32))
    rng = np.random.default_rng(2)
    for _ in range(40):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()

    real_meta = decoder._video_meta

    def lying_meta(p):
        fps, total = real_meta(p)
        return fps, total * 4  # metadata claims 4x the real length

    monkeypatch.setattr(decoder, "_video_meta", lying_meta)
    got = decoder.decode(path, 4, 8, clip_idx=2, num_clips=3)
    assert got is not None and got.shape == (8, 32, 32, 3)


def test_decode_corrupt_file_returns_none(tmp_path):
    """Decode failure must return None so dataset retry-with-replacement
    engages (reference kinetics.py:282-309)."""
    from vtm.data import decoder

    path = str(tmp_path / "corrupt.mp4")
    with open(path, "wb") as f:
        f.write(b"\x00" * 512)
    assert decoder.decode(path, 4, 8, clip_idx=0, num_clips=3) is None


def test_kinetics_ssl_multiclip(tmp_path):
    """DATA.TRAIN_CROP_NUM_TEMPORAL > 1: the item carries a stacked
    'clips' key of independently-sampled views (reference SSL path,
    kinetics.py:256-311)."""
    import cv2

    vid_path = tmp_path / "v0.avi"
    w = cv2.VideoWriter(
        str(vid_path), cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48)
    )
    rng = np.random.default_rng(0)
    for _ in range(60):
        w.write(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
    w.release()
    (tmp_path / "train.csv").write_text(f"{vid_path} 1\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [32, 40]
    cfg.DATA.TRAIN_CROP_NUM_TEMPORAL = 2
    cfg.DATA.TRAIN_CROP_NUM_SPATIAL = 2
    from vtm.data.kinetics import Kinetics

    ds = Kinetics(cfg, "train")
    item = ds[0]
    assert item["clips"].shape == (4, 4, 32, 32, 3)  # 2x2 views
    # independent augmentation: views differ
    assert not np.allclose(item["clips"][0], item["clips"][1])
    assert item["frames"].shape == (4, 32, 32, 3)


def test_decode_clips_gap_constraints(tmp_path):
    """decode_clips honours min/max gap constraints between the
    sampled windows (get_multiple_start_end_idx)."""
    import cv2

    from vtm.data import decoder

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32))
    rng = np.random.default_rng(1)
    for _ in range(90):
        w.write(rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))
    w.release()

    import random

    random.seed(0)
    clips = decoder.decode_clips(
        path, sampling_rate=2, num_frames=4, num_decode=3
    )
    assert clips is not None and len(clips) == 3
    for c in clips:
        assert c.shape == (4, 32, 32, 3)
