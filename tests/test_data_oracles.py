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
    # later tests (test_vis_tail's ava_demo oracle) import
    # slowfast.utils.checkpoint, which needs this name from the same
    # (now stubbed, persisting in sys.modules) module
    env_mod.checkpoint_pathmgr = types.SimpleNamespace(open=open)
    build_mod = types.ModuleType("slowfast.datasets.build")

    class _Registry:
        def register(self, *a, **k):
            return lambda cls: cls

    build_mod.DATASET_REGISTRY = _Registry()
    # the stub persists in sys.modules: later oracle imports (the
    # driver-parity meters chain pulls datasets/loader.py) also need
    # build_dataset from this module
    build_mod.build_dataset = mock.MagicMock(name="build_dataset")
    utils_mod = mock.MagicMock(name="slowfast.datasets.utils")
    utils_mod.__spec__ = mock.MagicMock()
    # slowfast.utils must be a PACKAGE (have __path__) — later tests
    # import real submodules (slowfast.utils.misc/checkpoint) through it
    from conftest import REFERENCE

    upkg = sys.modules.setdefault("slowfast.utils", types.ModuleType("slowfast.utils"))
    if not hasattr(upkg, "__path__"):
        upkg.__path__ = [str(REFERENCE / "slowfast/utils")]
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


# ------------------------------------------------------ mask generators

@pytest.mark.parametrize("num_masking", [40, 80])
def test_masking_generator_2d_parity(num_masking):
    ref_transform = load_reference_module(
        "slowfast/datasets/transform.py", "ref_transform_mask"
    )
    from vtm.data.masking import MaskingGenerator

    for seed in range(4):
        random.seed(seed)
        ref = ref_transform.MaskingGenerator(
            (14, 14), num_masking, min_num_patches=num_masking // 5
        )()
        random.seed(seed)
        got = MaskingGenerator((14, 14), num_masking, min_num_patches=num_masking // 5)()
        np.testing.assert_array_equal(got, np.asarray(ref))


def test_masking_generator_3d_parity():
    ref_transform = load_reference_module(
        "slowfast/datasets/transform.py", "ref_transform_mask"
    )
    from vtm.data.masking import MaskingGenerator3D

    for seed in range(4):
        random.seed(seed)
        ref = ref_transform.MaskingGenerator3D(
            (8, 7, 7), 160, min_num_patches=9, max_num_patches=49
        )()
        random.seed(seed)
        got = MaskingGenerator3D((8, 7, 7), 160, min_num_patches=9, max_num_patches=49)()
        np.testing.assert_array_equal(got, np.asarray(ref))


def test_generate_mask_branches():
    from vtm.config import get_cfg
    from vtm.data.masking import generate_mask

    cfg = get_cfg()
    assert generate_mask(cfg) is None  # loader off by default

    cfg.AUG.GEN_MASK_LOADER = True
    cfg.AUG.MASK_RATIO = 0.4
    cfg.AUG.MASK_WINDOW_SIZE = [8, 7, 7]
    random.seed(0)
    m3 = generate_mask(cfg)
    assert m3.shape == (8, 7, 7) and 0 < m3.sum() <= round(392 * 0.4) + 49

    cfg.AUG.MASK_FRAMES = True
    random.seed(0)
    mf = generate_mask(cfg)
    assert mf.shape == (8, 7, 7)
    frame_sums = mf.reshape(8, -1).sum(1)
    assert sorted(set(frame_sums)) == [0, 49] and (frame_sums == 49).sum() == 3

    cfg.AUG.MASK_FRAMES = False
    cfg.AUG.MASK_TUBE = True
    cfg.AUG.MASK_WINDOW_SIZE = [14, 14]
    random.seed(0)
    mt = generate_mask(cfg)
    assert mt.shape == (8, 14, 14)
    np.testing.assert_array_equal(mt[0], mt[5])  # tube: same mask per frame


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
