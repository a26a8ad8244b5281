#!/usr/bin/env python3
"""Dataset subsampling/caching CLI (reference:
slowfast/datasets/dataset_utils.py:361-378), driven by
``DATASET_UTILS.*`` flags."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from vtm.analysis import dataset_tools  # noqa: E402
from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402


def main():
    args = parse_args()
    for path in args.cfg_files or [None]:
        cfg = load_config(args, path)
        assert_and_infer_cfg(cfg)
        dataset_tools.run(cfg)


if __name__ == "__main__":
    main()
