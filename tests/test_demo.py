"""Demo pipeline end-to-end on a synthetic mp4."""

import numpy as np
import pytest

from vtm.config import assert_and_infer_cfg, get_cfg


def _write_video(path, t=20, size=64):
    cv2 = pytest.importorskip("cv2")
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (size, size)
    )
    rng = np.random.default_rng(0)
    for _ in range(t):
        w.write(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    w.release()


def test_demo_end_to_end(tmp_path):
    from tools.demo_net import run_demo

    src = tmp_path / "in.mp4"
    _write_video(src)
    cfg = get_cfg()
    cfg.merge_from_list([
        "MODEL.MODEL_NAME", "VideoMAE",
        "VIDEOMAE.MODEL", "vit_small_patch16_224",
        "MODEL.NUM_CLASSES", "5",
        "DATA.NUM_FRAMES", "4",
        "DATA.SAMPLING_RATE", "2",
        "DATA.TEST_CROP_SIZE", "32",
        "DATA.TRAIN_CROP_SIZE", "32",
        "DEMO.ENABLE", "True",
        "DEMO.INPUT_VIDEO", str(src),
        "DEMO.OUTPUT_FILE", str(tmp_path / "out.mp4"),
        "TOME.ENABLE", "True",
        "TOME.R_VALUE", "1",
        "TPU.COMPUTE_DTYPE", "float32",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    n = run_demo(cfg)
    assert n >= 1
    out = tmp_path / "out.mp4"
    assert out.exists() and out.stat().st_size > 0


def test_demo_threaded(tmp_path):
    from tools.demo_net import run_demo

    src = tmp_path / "in.mp4"
    _write_video(src)
    cfg = get_cfg()
    cfg.merge_from_list([
        "MODEL.MODEL_NAME", "VideoMAE",
        "VIDEOMAE.MODEL", "vit_small_patch16_224",
        "MODEL.NUM_CLASSES", "5",
        "DATA.NUM_FRAMES", "4",
        "DATA.SAMPLING_RATE", "2",
        "DATA.TEST_CROP_SIZE", "32",
        "DATA.TRAIN_CROP_SIZE", "32",
        "DEMO.THREAD_ENABLE", "True",
        "DEMO.INPUT_VIDEO", str(src),
        "DEMO.OUTPUT_FILE", str(tmp_path / "out.mp4"),
        "TPU.COMPUTE_DTYPE", "float32",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    assert run_demo(cfg) >= 1


def test_demo_bn_conv_family(tmp_path):
    """Regression: the demo Predictor must thread batch_stats — a bare
    {'params'} apply crashes the BN conv families
    (ScopeCollectionNotFound on the running stats)."""
    from test_convnet import tiny_cfg
    from tools.demo_net import run_demo

    src = tmp_path / "in.mp4"
    _write_video(src)
    cfg = tiny_cfg("ResNet", "i3d")
    cfg.merge_from_list([
        "DEMO.ENABLE", "True",
        "DEMO.INPUT_VIDEO", str(src),
        "DEMO.OUTPUT_FILE", str(tmp_path / "out.mp4"),
        "DATA.SAMPLING_RATE", "2",
        "TPU.COMPUTE_DTYPE", "float32",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    n = run_demo(cfg)
    assert n >= 1
