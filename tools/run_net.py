#!/usr/bin/env python3
"""Train + test entry point (reference: tools/run_net.py:13-39)."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402


def main():
    args = parse_args()
    for path in args.cfg_files or [None]:
        cfg = load_config(args, path)
        assert_and_infer_cfg(cfg)
        if cfg.TRAIN.ENABLE:
            from tools.train_net import train

            train(cfg)
        if cfg.TEST.ENABLE:
            from tools.test_net import test

            # NUM_ENSEMBLE_VIEWS == -1 sweeps views; test() expands it
            # (tools/test_net.py views_list) — one copy of the [1,3,5,7,10]
            test(cfg)


if __name__ == "__main__":
    main()
