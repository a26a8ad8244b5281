"""Chunked-csv loading (reference kinetics.py:77-181 +
tools/train_net.py:793-804): train epochs walk disjoint
LOADER_CHUNK_SIZE slabs of the csv via DATA.SKIP_ROWS rotation.
"""

from __future__ import annotations

import math

import numpy as np
import pytest


def _make_csv(tmp_path, n_rows=7):
    lines = [f"/videos/v{i}.mp4 {i}" for i in range(n_rows)]
    (tmp_path / "train.csv").write_text("\n".join(lines) + "\n")
    return lines


def _cfg(tmp_path, chunk, skip):
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = ""
    cfg.DATA.LOADER_CHUNK_SIZE = chunk
    cfg.DATA.SKIP_ROWS = skip
    return cfg


def _videos(cfg):
    from vtm.data.kinetics import Kinetics

    ds = Kinetics.__new__(Kinetics)
    ds.cfg = cfg
    ds.mode = "train"
    ds._num_clips = 1
    ds._construct_loader()
    return [v.split("/")[-1] for v in ds._path_to_videos]


def test_chunks_are_disjoint_and_rotate(tmp_path):
    """Three chunk positions cover disjoint row slabs; the train_net
    rotation formula cycles them (pandas header-infer consumes the
    first unskipped row, exactly like the reference's read_csv call)."""
    _make_csv(tmp_path, n_rows=7)
    seen = []
    for skip in (0, 2, 4):
        vids = _videos(_cfg(tmp_path, chunk=2, skip=skip))
        assert len(vids) == 2
        seen.append(set(vids))
    assert seen[0] & seen[1] == set()
    assert seen[1] & seen[2] == set()
    assert seen[0] & seen[2] == set()

    # the train_net rotation: epoch e -> skip_rows (e % num_chunks)*chunk
    overall, chunk = 6, 2
    num_chunks = math.ceil(overall / chunk)
    skips = [(e % num_chunks) * chunk for e in range(6)]
    assert skips == [0, 2, 4, 0, 2, 4]


def test_chunk_disabled_reads_all_rows(tmp_path):
    lines = _make_csv(tmp_path, n_rows=5)
    vids = _videos(_cfg(tmp_path, chunk=0, skip=0))
    assert len(vids) == len(lines)


def test_row_field_variants(tmp_path):
    """1-field (no label -> 0) and 3-field (path, frame-num, label) rows
    parse like the reference (kinetics.py:131-147)."""
    (tmp_path / "train.csv").write_text(
        "/videos/a.mp4\n/videos/b.mp4 7\n/videos/c.mp4 99 3\n"
    )
    from vtm.data.kinetics import Kinetics

    cfg = _cfg(tmp_path, chunk=0, skip=0)
    ds = Kinetics.__new__(Kinetics)
    ds.cfg = cfg
    ds.mode = "train"
    ds._num_clips = 1
    ds._construct_loader()
    assert ds._labels == [0, 7, 3]


def test_bad_skip_rows_resets(tmp_path):
    """skip_rows beyond the file resets to 0 (reference's except branch,
    kinetics.py:176-179)."""
    _make_csv(tmp_path, n_rows=3)
    vids = _videos(_cfg(tmp_path, chunk=2, skip=50))
    assert len(vids) == 2  # chunk 0 after the reset


def test_rotate_chunked_csv_helper(tmp_path):
    """The shared per-epoch rotation helper (used by BOTH train() and
    train_contrastive() — the reference's single loop rotates for the
    SSL path too, tools/train_net.py:793-804): epoch 0 / chunking off
    -> None; otherwise a fresh loader over the rotated slab, with
    cfg.DATA.SKIP_ROWS advanced by the reference formula."""
    from tools.train_net import rotate_chunked_csv

    _make_csv(tmp_path, n_rows=7)
    cfg = _cfg(tmp_path, chunk=2, skip=0)
    cfg.DATA.LOADER_CHUNK_OVERALL_SIZE = 6
    cfg.TRAIN.DATASET = "kinetics"
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.DATA_LOADER.NUM_WORKERS = 0

    assert rotate_chunked_csv(cfg, 0) is None
    cfg.DATA.LOADER_CHUNK_SIZE = 0
    assert rotate_chunked_csv(cfg, 1) is None
    cfg.DATA.LOADER_CHUNK_SIZE = 2

    slabs = []
    for epoch in (1, 2, 3, 4):
        loader = rotate_chunked_csv(cfg, epoch)
        assert loader is not None
        expected_skip = (epoch % 3) * 2
        assert cfg.DATA.SKIP_ROWS == expected_skip
        slabs.append(
            {v.split("/")[-1] for v in loader.dataset._path_to_videos}
        )
    # epochs 1,2,3 walk disjoint slabs; epoch 4 wraps to epoch-1's slab
    assert slabs[0] & slabs[1] == set()
    assert slabs[1] & slabs[2] == set()
    assert slabs[3] == slabs[0]


def test_rotate_overall_size_zero_is_single_chunk(tmp_path):
    """LOADER_CHUNK_OVERALL_SIZE left at 0 (reference crashes with
    ZeroDivisionError here) is treated as one chunk: skip stays 0."""
    from tools.train_net import rotate_chunked_csv

    _make_csv(tmp_path, n_rows=5)
    cfg = _cfg(tmp_path, chunk=2, skip=0)
    cfg.TRAIN.DATASET = "kinetics"
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.DATA_LOADER.NUM_WORKERS = 0
    loader = rotate_chunked_csv(cfg, 3)
    assert loader is not None
    assert cfg.DATA.SKIP_ROWS == 0
