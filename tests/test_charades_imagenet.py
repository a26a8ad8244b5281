"""Charades + ImageNet dataset tests (oracle where the reference is
importable, behavioral otherwise)."""

import os
import random

import numpy as np
import pytest

from conftest import load_reference_module


def _write_charades_tree(tmp_path, num_videos=3, frames_per_video=30, classes=157):
    """Frame-list csv + jpgs in the reference layout."""
    import cv2

    rng = np.random.default_rng(0)
    frame_dir = tmp_path / "frames"
    frame_dir.mkdir(exist_ok=True)
    lines = ["original_vido_id video_id frame_id path labels"]
    for v in range(num_videos):
        vid = f"vid{v:03d}"
        (frame_dir / vid).mkdir(exist_ok=True)
        for f in range(frames_per_video):
            rel = f"{vid}/{vid}_{f:06d}.jpg"
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(frame_dir / rel), img)
            labels = sorted(random.Random(v * 100 + f).sample(range(classes), k=2))
            lines.append(
                f"{vid} {v} {f} {rel} \"{','.join(str(l) for l in labels)}\""
            )
    for split in ("train", "val"):
        (tmp_path / f"{split}.csv").write_text("\n".join(lines) + "\n")
    return frame_dir


def _charades_cfg(tmp_path):
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(tmp_path / "frames")
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 3
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 48]
    cfg.MODEL.NUM_CLASSES = 157
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    return cfg


def test_charades_label_helpers_match_reference():
    from test_convnet import _install_native_stubs

    _install_native_stubs()  # the reference utils import chain hits iopath
    ref_utils = load_reference_module("slowfast/datasets/utils.py", "ref_ds_utils")
    from vtm.data.charades import aggregate_labels, convert_to_video_level_labels

    label_list = [[3, 1], [1, 9], [], [5]]
    assert sorted(ref_utils.aggregate_labels(label_list)) == aggregate_labels(
        label_list
    )
    video_labels = [[[3, 1], [9]], [[2], []]]
    want = ref_utils.convert_to_video_level_labels(
        [[list(l) for l in v] for v in video_labels]
    )
    got = convert_to_video_level_labels(video_labels)
    for wv, gv in zip(want, got):
        for wl, gl in zip(wv, gv):
            assert sorted(wl) == sorted(gl)


def test_charades_test_mode_seq_frames_match_reference(tmp_path):
    """Deterministic test-mode clip sampling vs the reference math
    (charades.py:115-152)."""
    _write_charades_tree(tmp_path)
    from vtm.data.charades import Charades

    cfg = _charades_cfg(tmp_path)
    ds = Charades(cfg, "test")
    assert len(ds) == 3 * 2 * 3  # videos x views x crops
    num_frames, rate = cfg.DATA.NUM_FRAMES, cfg.DATA.SAMPLING_RATE
    clip_length = (num_frames - 1) * rate + 1
    video_length = 30
    for index in range(len(ds)):
        tsi = ds._spatial_temporal_idx[index] // cfg.TEST.NUM_SPATIAL_CROPS
        gap = float(max(video_length - clip_length, 0)) / (
            cfg.TEST.NUM_ENSEMBLE_VIEWS - 1
        )
        start = int(round(gap * tsi))
        want = [
            max(min(start + i * rate, video_length - 1), 0)
            for i in range(num_frames)
        ]
        assert ds.get_seq_frames(index) == want


def test_charades_getitem_multilabel(tmp_path):
    _write_charades_tree(tmp_path)
    from vtm.data.charades import Charades

    cfg = _charades_cfg(tmp_path)
    for mode in ("train", "test"):
        ds = Charades(cfg, mode)
        item = ds[0]
        assert item["frames"].shape == (4, 32, 32, 3)
        assert item["label"].shape == (157,)
        assert set(np.unique(item["label"])) <= {0.0, 1.0}
        assert item["label"].sum() >= 2  # >= one frame's 2 labels


def _write_imagenet_tree(tmp_path, classes=("n01440764", "n01443537"), per_class=2):
    import cv2

    rng = np.random.default_rng(1)
    for split in ("train", "val"):
        for c in classes:
            d = tmp_path / split / c
            d.mkdir(parents=True, exist_ok=True)
            for i in range(per_class):
                img = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
                cv2.imwrite(str(d / f"{c}_{i}.JPEG"), img)


def _imagenet_cfg(tmp_path):
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 2
    return cfg


def test_imagenet_imdb_and_val_determinism(tmp_path):
    _write_imagenet_tree(tmp_path)
    from vtm.data.imagenet import Imagenet

    cfg = _imagenet_cfg(tmp_path)
    ds = Imagenet(cfg, "val")
    assert len(ds) == 4
    # classes map to contiguous sorted ids
    assert [e["class"] for e in ds._imdb] == [0, 0, 1, 1]
    a, b = ds[1], ds[1]
    assert a["frames"].shape == (1, 32, 32, 3)
    np.testing.assert_array_equal(a["frames"], b["frames"])
    assert a["label"] == 0


def test_imagenet_train_paths(tmp_path):
    _write_imagenet_tree(tmp_path)
    from vtm.data.imagenet import Imagenet

    cfg = _imagenet_cfg(tmp_path)
    ds = Imagenet(cfg, "train")
    item = ds[2]
    assert item["frames"].shape == (1, 32, 32, 3)
    assert item["label"] == 1
    # AUG path (timm-style pipeline mapped onto vtm pieces)
    cfg.AUG.ENABLE = True
    item = Imagenet(cfg, "train")[0]
    assert item["frames"].shape == (1, 32, 32, 3)
    assert np.isfinite(item["frames"]).all()


def test_imagenet_val_crop_matches_reference_recipe(tmp_path):
    """IN_VAL_CROP_RATIO geometry: resize short side to
    test/0.875 then center crop (reference imagenet.py:150-170)."""
    _write_imagenet_tree(tmp_path)
    from vtm.data.imagenet import Imagenet

    cfg = _imagenet_cfg(tmp_path)
    cfg.AUG.ENABLE = True  # tf path at val = resize+center-crop
    ds = Imagenet(cfg, "val")
    item = ds[0]
    assert item["frames"].shape == (1, 32, 32, 3)


def test_charades_multilabel_test_net_end_to_end(tmp_path):
    """tools/test_net.py on charades with DATA.MULTI_LABEL: the meter
    takes the multi-hot [C] labels and finalizes a mAP (reference
    TestMeter multi_label path, meters.py:295-300, 412-419). Before the
    multi_label port this crashed in update_stats (int() on a vector)."""
    import json

    from vtm.config import assert_and_infer_cfg

    _write_charades_tree(tmp_path, num_videos=3, frames_per_video=30)
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

    cfg = _charades_cfg(tmp_path)
    cfg.MODEL.MODEL_NAME = "ViViT"
    cfg.VIVIT.CONFIG_PATH = str(p)
    cfg.DATA.MULTI_LABEL = True
    cfg.TEST.DATASET = "charades"
    cfg.TEST.BATCH_SIZE = 2
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA_LOADER.NUM_WORKERS = 0
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg = assert_and_infer_cfg(cfg)

    from tools.test_net import test as run_test

    results = run_test(cfg)
    stats = results[0][1]
    assert "map" in stats
    assert 0.0 <= float(stats["map"]) <= 100.0
    assert stats["top1_acc"] == stats["map"]
