"""Metrics parity vs the reference torch implementation + meter math."""

import numpy as np
import pytest

from vtm.eval import metrics
from vtm.eval.meters import EPICTestMeter, TestMeter


@pytest.fixture(scope="session")
def ref_metrics():
    from conftest import load_reference_module

    return load_reference_module("slowfast/utils/metrics.py", "ref_metrics")


def test_topks_correct_matches_reference(ref_metrics):
    import torch

    rng = np.random.default_rng(0)
    preds = rng.standard_normal((64, 40)).astype(np.float32)
    labels = rng.integers(0, 40, size=64)
    ref = ref_metrics.topks_correct(
        torch.from_numpy(preds), torch.from_numpy(labels), (1, 5)
    )
    got = metrics.topks_correct(preds, labels, (1, 5))
    assert [float(x) for x in ref] == got


def test_multitask_topks_matches_reference(ref_metrics):
    import torch

    rng = np.random.default_rng(1)
    verb = rng.standard_normal((32, 10)).astype(np.float32)
    noun = rng.standard_normal((32, 20)).astype(np.float32)
    vl = rng.integers(0, 10, size=32)
    nl = rng.integers(0, 20, size=32)
    ref = ref_metrics.multitask_topks_correct(
        (torch.from_numpy(verb), torch.from_numpy(noun)),
        (torch.from_numpy(vl), torch.from_numpy(nl)),
        (1, 5),
    )
    got = metrics.multitask_topks_correct((verb, noun), (vl, nl), (1, 5))
    assert [float(x) for x in ref] == got


def test_testmeter_multiview_ensemble():
    # 2 videos x 3 clips, 4 classes
    meter = TestMeter(num_videos=2, num_clips=3, num_cls=4, overall_iters=1)
    preds = np.zeros((6, 4))
    labels = np.array([2, 2, 2, 1, 1, 1])
    clip_ids = np.arange(6)
    # video 0's clips vote class 2; video 1's clips vote class 1
    preds[0:3, 2] = [1.0, 2.0, 0.5]
    preds[3:6, 1] = [0.2, 0.3, 0.9]
    preds[3, 0] = 10.0  # one outlier clip votes class 0 but sum still wins
    meter.update_stats(preds, labels, clip_ids)
    stats = meter.finalize_metrics(ks=(1,))
    assert stats["top1_acc"] == "50.00" or float(stats["top1_acc"]) == 50.0
    # class 0 outlier beats summed class-1 votes for video 1 -> 50%
    assert meter.video_preds[0].argmax() == 2


def test_epictestmeter_action_metric():
    meter = EPICTestMeter(num_videos=1, num_clips=1, num_cls=(3, 4), overall_iters=1)
    verb = np.array([[0.1, 5.0, 0.1]])
    noun = np.array([[0.1, 0.1, 9.0, 0.1]])
    meter.update_stats(
        (verb, noun),
        (np.array([1]), np.array([2])),
        ["narr_0"],
        np.array([0]),
    )
    stats = meter.finalize_metrics(ks=(1,))
    assert float(stats["verb_top1_acc"]) == 100.0
    assert float(stats["noun_top1_acc"]) == 100.0
    assert float(stats["action_top1_acc"]) == 100.0


def test_clip_length_histogram(tmp_path):
    """TEST.CLIP_LENGTH_HISTOGRAM writes a per-video (length, outcome)
    csv (reference meters.py:437-440)."""
    import pandas as pd

    from vtm.config import get_cfg
    from vtm.eval.meters import TestMeter

    cfg = get_cfg()
    cfg.TEST.DATASET = "kinetics"
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.TEST.CLIP_LENGTH_HISTOGRAM = True
    cfg.TOME.R_VALUE = 7
    pd.DataFrame(
        {"video": [f"v{i}.mp4" for i in range(4)], "length": [1.0, 2.0, 3.0, 4.0]}
    ).to_csv(tmp_path / "kinetics_lengths.csv", index=False)

    meter = TestMeter(4, 1, 3, 1, cfg=cfg)
    preds = np.eye(3)[[0, 1, 2, 0]].astype(np.float64)
    labels = np.array([0, 1, 0, 0])
    meter.update_stats(preds, labels, np.arange(4))
    meter.finalize_metrics()
    out = pd.read_csv(tmp_path / "random_init_r_7.csv")
    assert list(out["outcome"]) == [True, True, False, True]
