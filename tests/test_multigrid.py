"""Multigrid schedule parity + short-cycle loader + e2e long-cycle train."""

import numpy as np
import pytest

from conftest import load_reference_module
from test_convnet import _install_native_stubs, tiny_cfg


def _mg_cfg():
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.DATA.NUM_FRAMES = 32
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.SOLVER.STEPS = [0, 94, 154, 196]
    cfg.SOLVER.LRS = [1, 0.1, 0.01, 0.001]
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.MAX_EPOCH = 239
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.NUM_GPUS = 1
    return cfg


def test_long_cycle_schedule_matches_reference():
    _install_native_stubs()
    ref_mg = load_reference_module("slowfast/utils/multigrid.py", "ref_multigrid")
    from vtm.train.multigrid import MultigridSchedule

    # the reference indexes all_shapes[-1][2] (multigrid.py:196) which
    # only exists when SHORT_CYCLE is on — the long-cycle-only branch
    # crashes upstream, so the oracle comparison runs with short cycle
    # (our port uses [-1], valid for both).
    for short in (True,):
        cfg = _mg_cfg()
        cfg.MULTIGRID.SHORT_CYCLE = short
        ref_cfg = _mg_cfg()
        ref_cfg.MULTIGRID.SHORT_CYCLE = short

        ours = MultigridSchedule()
        cfg = ours.init_multigrid(cfg)
        theirs = ref_mg.MultigridSchedule()
        ref_cfg = theirs.init_multigrid(ref_cfg)

        assert ours.schedule == [tuple(s) if not isinstance(s, tuple) else s
                                 for s in theirs.schedule]
        assert cfg.SOLVER.STEPS == ref_cfg.SOLVER.STEPS
        assert cfg.SOLVER.LRS == pytest.approx(ref_cfg.SOLVER.LRS)
        assert cfg.SOLVER.MAX_EPOCH == ref_cfg.SOLVER.MAX_EPOCH

        # per-epoch long-cycle updates agree
        for epoch in range(0, cfg.SOLVER.MAX_EPOCH, 7):
            cfg, changed = ours.update_long_cycle(cfg, epoch)
            ref_cfg, ref_changed = theirs.update_long_cycle(ref_cfg, epoch)
            assert changed == ref_changed, epoch
            assert cfg.DATA.NUM_FRAMES == ref_cfg.DATA.NUM_FRAMES
            assert cfg.DATA.TRAIN_CROP_SIZE == ref_cfg.DATA.TRAIN_CROP_SIZE
            assert cfg.TRAIN.BATCH_SIZE == ref_cfg.TRAIN.BATCH_SIZE
            assert cfg.BN.NORM_TYPE == ref_cfg.BN.NORM_TYPE

    # long-cycle-only branch (reference crashes here; ours must not)
    cfg = _mg_cfg()
    ours = MultigridSchedule()
    cfg = ours.init_multigrid(cfg)
    assert ours.schedule[-1][-1] == cfg.SOLVER.MAX_EPOCH
    assert all(
        e0[-1] <= e1[-1] for e0, e1 in zip(ours.schedule, ours.schedule[1:])
    )


def test_short_cycle_loader_batches():
    from vtm.config import get_cfg
    from vtm.data.loader import construct_loader

    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 2  # 16 synthetic train clips -> phases 8/4/2
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MULTIGRID.SHORT_CYCLE = True
    cfg.MULTIGRID.DEFAULT_S = 32
    cfg.DATA_LOADER.NUM_WORKERS = 1
    loader = construct_loader(cfg, "train")
    sizes = [b["frames"].shape[0] for b in loader]
    # factors (0.5, 0.5**0.5) -> batch multipliers (4, 2) then base
    assert sizes[:3] == [8, 4, 2]
    assert len(loader) == len(sizes)
    # phase-0/1 items are cropped at the short-cycle sizes
    shapes = [b["frames"].shape[2] for b in loader]
    assert shapes[:3] == [16, 23, 32]

    # drop_last: __len__ must walk the same 3-phase schedule as
    # __iter__ (an average-size estimate disagrees on ragged tails)
    from vtm.data.loader import BatchLoader

    short = BatchLoader(
        loader.dataset, batch_size=4, drop_last=True, num_workers=1,
        short_cycle_batch_sizes=[8, 4, 2],
    )
    assert len(short) == sum(1 for _ in short)


def test_long_cycle_slowfast_train_e2e(tmp_path):
    """Two epochs of tiny SlowFast under a long-cycle schedule: shapes
    change between epochs, BN stat tree adapts, training completes."""
    from tools.train_net import train
    from vtm.config import assert_and_infer_cfg

    cfg = tiny_cfg("SlowFast", "slowfast")
    cfg.merge_from_list([
        "TRAIN.DATASET", "synthetic",
        "TRAIN.BATCH_SIZE", "8",
        "SOLVER.OPTIMIZING_METHOD", "sgd",
        "SOLVER.LR_POLICY", "steps_with_relative_lrs",
        "SOLVER.STEPS", "[0, 2, 3]",
        "SOLVER.LRS", "[1, 0.1, 0.01]",
        "SOLVER.MAX_EPOCH", "3",
        "MULTIGRID.LONG_CYCLE", "True",
        "MULTIGRID.LONG_CYCLE_FACTORS", "[(0.5, 0.7071067811865476), (1.0, 1.0)]",
        "MULTIGRID.BN_BASE_SIZE", "4",
        "TRAIN.EVAL_PERIOD", "100",
        "TRAIN.CHECKPOINT_PERIOD", "100",
        "DATA_LOADER.NUM_WORKERS", "0",
        "DATA.NUM_FRAMES", "8",
        "DATA.TRAIN_CROP_SIZE", "64",
        "DATA.TEST_CROP_SIZE", "64",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    params = train(cfg)
    assert params is not None
    # the schedule really mutated the shapes at least once
    assert cfg.MULTIGRID.DEFAULT_S == 64
