"""Dataset index-math parity vs the reference modules.

Eval parity depends on these being bit-exact (SURVEY §7.5): SSv2 segment
sampling (reference ssv2.py:169-190), EPIC-KITCHENS record frame math
(epickitchens_record.py:18-55) and pack_frames index generation
(frame_loader.py:31-71)."""

import random
import sys
import types
import unittest.mock as mock

import numpy as np
import pytest

from conftest import load_reference_module


# --------------------------------------------------------------- ssv2

def _ref_ssv2_module():
    # ssv2.py imports slowfast.utils.{logging,env} and .build/.utils —
    # stub the ones whose attributes get_seq_frames never touches.
    logging_mod = types.ModuleType("slowfast.utils.logging")
    import logging as _pylogging

    logging_mod.get_logger = _pylogging.getLogger
    env_mod = types.ModuleType("slowfast.utils.env")
    env_mod.pathmgr = types.SimpleNamespace(open=open)
    build_mod = types.ModuleType("slowfast.datasets.build")

    class _Registry:
        def register(self, *a, **k):
            return lambda cls: cls

    build_mod.DATASET_REGISTRY = _Registry()
    utils_mod = mock.MagicMock(name="slowfast.datasets.utils")
    utils_mod.__spec__ = mock.MagicMock()
    sys.modules.setdefault("slowfast.utils", types.ModuleType("slowfast.utils"))
    sys.modules["slowfast.utils.logging"] = logging_mod
    sys.modules["slowfast.utils.env"] = env_mod
    sys.modules["slowfast.datasets.build"] = build_mod
    sys.modules["slowfast.datasets.utils"] = utils_mod
    return load_reference_module("slowfast/datasets/ssv2.py", "ref_ssv2")


@pytest.mark.parametrize("video_length", [7, 16, 29, 100, 173, 1000])
@pytest.mark.parametrize("num_frames", [8, 16, 32])
@pytest.mark.parametrize("mode", ["train", "test"])
def test_ssv2_get_seq_frames_parity(video_length, num_frames, mode):
    ref_mod = _ref_ssv2_module()
    from vtm.config import get_cfg
    from vtm.data.ssv2 import Ssv2

    cfg = get_cfg()
    cfg.DATA.NUM_FRAMES = num_frames

    def make(cls):
        obj = cls.__new__(cls)
        obj.cfg = cfg
        obj.mode = mode
        obj._path_to_videos = [[f"f{i}.jpg" for i in range(video_length)]]
        return obj

    ref = make(ref_mod.Ssv2)
    got = make(Ssv2)

    # train mode draws via the global `random` module in frame order —
    # identical seeding must give identical sequences
    random.seed(1234)
    ref_seq = ref_mod.Ssv2.get_seq_frames(ref, 0)
    random.seed(1234)
    got_seq = Ssv2.get_seq_frames(got, 0)
    assert got_seq == list(ref_seq)
    assert all(0 <= i < video_length for i in got_seq)


# --------------------------------------------------- epic-kitchens record

def _ref_epic_record():
    return load_reference_module(
        "slowfast/datasets/epickitchens_record.py", "ref_epic_record"
    )


@pytest.mark.parametrize(
    "video_id,start,stop",
    [
        ("P01_11", "00:00:01.00", "00:00:03.50"),     # 60 fps (2-digit id)
        ("P01_101", "00:23:45.67", "00:23:59.99"),    # 50 fps (3-digit id)
        ("P22_07", "01:02:03.04", "01:02:59.99"),
        ("P35_104", "00:00:00.00", "00:00:00.54"),
    ],
)
def test_epic_record_parity(video_id, start, stop):
    ref_mod = _ref_epic_record()
    from vtm.data.epickitchens import EpicKitchensVideoRecord

    series = {
        "participant_id": video_id.split("_")[0],
        "video_id": video_id,
        "start_timestamp": start,
        "stop_timestamp": stop,
        "verb_class": 3,
        "noun_class": 17,
    }
    ref = ref_mod.EpicKitchensVideoRecord(("nar_1", series))
    got = EpicKitchensVideoRecord(("nar_1", series))
    assert got.fps == ref.fps
    assert got.start_frame == ref.start_frame
    assert got.end_frame == ref.end_frame
    assert got.num_frames == ref.num_frames
    assert got.label == ref.label
    assert got.metadata == ref.metadata


# --------------------------------------------------- epic frame packing

def _ref_frame_loader():
    # frame_loader imports `.utils` (heavy) and `.decoder` (needed for
    # get_start_end_idx). Stub utils; capture the img_paths it receives.
    utils_mod = mock.MagicMock(name="slowfast.datasets.utils")
    utils_mod.__spec__ = mock.MagicMock()
    sys.modules["slowfast.datasets.utils"] = utils_mod
    mod = load_reference_module("slowfast/datasets/frame_loader.py", "ref_frame_loader")
    return mod, utils_mod


class _Cfg:
    pass


def _epic_cfg(participant_first, num_frames=8, sampling_rate=2, views=10):
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.EPICKITCHENS.VISUAL_DATA_DIR = "/data/epic"
    cfg.EPICKITCHENS.PARTICIPANT_FIRST = participant_first
    cfg.DATA.NUM_FRAMES = num_frames
    cfg.DATA.SAMPLING_RATE = sampling_rate
    cfg.TEST.NUM_ENSEMBLE_VIEWS = views
    return cfg


@pytest.mark.parametrize("video_id", ["P01_11", "P01_101"])  # 60 / 50 fps
@pytest.mark.parametrize("participant_first", [True, False])
@pytest.mark.parametrize("temporal_idx", [-1, 0, 4, 9])
def test_epic_pack_frames_index_parity(video_id, participant_first, temporal_idx):
    ref_mod, ref_utils = _ref_frame_loader()
    import vtm.data.epickitchens as vtm_epic

    series = {
        "participant_id": video_id.split("_")[0],
        "video_id": video_id,
        "start_timestamp": "00:01:00.00",
        "stop_timestamp": "00:01:02.75",
        "verb_class": 0,
        "noun_class": 0,
    }
    record = vtm_epic.EpicKitchensVideoRecord(("n", series))
    cfg = _epic_cfg(participant_first)

    if temporal_idx == -1:
        # train-mode sampling draws a uniform offset via the global
        # `random` module on both sides; pin it so the index math itself
        # is compared
        random.seed(7)
    ref_utils.retry_load_images.reset_mock()
    ref_mod.pack_frames_to_video_clip(cfg, record, temporal_idx)
    ref_paths = ref_utils.retry_load_images.call_args[0][0]

    got_paths = []
    orig = vtm_epic.retry_load_images
    try:
        vtm_epic.retry_load_images = lambda paths, **k: got_paths.extend(paths)
        if temporal_idx == -1:
            random.seed(7)
        vtm_epic.pack_frames_to_video_clip(cfg, record, temporal_idx)
    finally:
        vtm_epic.retry_load_images = orig

    assert [str(p) for p in got_paths] == [str(p) for p in ref_paths]
