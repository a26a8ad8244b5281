#!/usr/bin/env python3
"""Layer-duplication experiment (reference:
notebooks/layer_duplication_example.ipynb — duplicate layer 0 or 11
x12 and merge only inside the duplicated run).

Usage:
  python examples/layer_duplication_example.py --cfg configs/videomae/kinetics/tome_VideoMAE_B_16_224_K400.yaml \
      --opts TOME.LAYER_TO_DUPLICATE 0 TOME.LAYER_QUANTITY 12 TOME.R_VALUE 131
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402

from vtm.checkpoints.checkpoint import load_test_checkpoint  # noqa: E402
from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.models import build_model  # noqa: E402
from examples.vivit_example import load_clip  # noqa: E402


def main():
    args = parse_args()
    cfg = load_config(args, (args.cfg_files or [None])[0])
    if not args.cfg_files:
        # bare-default fallback: align crops so fixed pos tables match
        # the synthetic clip (224 train / 256 test defaults differ)
        cfg.DATA.TEST_CROP_SIZE = cfg.DATA.TRAIN_CROP_SIZE
    assert_and_infer_cfg(cfg)
    cfg.TOME.ENABLE = True
    if cfg.TOME.LAYER_QUANTITY <= 1:
        cfg.TOME.LAYER_QUANTITY = 12  # notebook default: one layer x12

    bundle = build_model(cfg)
    if cfg.TEST.CHECKPOINT_FILE_PATH and "<" not in cfg.TEST.CHECKPOINT_FILE_PATH:
        bundle = load_test_checkpoint(cfg, bundle)
    print(
        f"duplicating layer {cfg.TOME.LAYER_TO_DUPLICATE} "
        f"x{cfg.TOME.LAYER_QUANTITY}, rs={bundle.policy.rs}"
    )

    clip = load_clip(cfg)
    logits, state = bundle.module.apply({"params": bundle.params}, jnp.asarray(clip))
    probs = np.asarray(logits)
    if probs.ndim == 2:
        top = probs[0].argsort()[-5:][::-1]
        print("top-5 classes:", top.tolist())
    if state.size is not None:
        print("final tokens:", state.size.shape[1])


if __name__ == "__main__":
    main()
