#!/usr/bin/env python3
"""Clip-splicing semantics probe (reference:
notebooks/clip_splicing_example.ipynb — Random / SameClass /
KLSimilarity donor policies).

Usage:
  python examples/clip_splicing_example.py --cfg configs/videomae/kinetics/tome_VideoMAE_B_16_224_K400.yaml \
      --opts DATA.PATH_TO_DATA_DIR /data/k400
Falls back to the synthetic dataset without real data.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402

from vtm.analysis import SplicedDataset  # noqa: E402
from vtm.checkpoints.checkpoint import load_test_checkpoint  # noqa: E402
from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.data.loader import build_dataset  # noqa: E402
from vtm.models import build_model  # noqa: E402


def main():
    args = parse_args()
    cfg = load_config(args, (args.cfg_files or [None])[0])
    if not args.cfg_files:
        # bare-default fallback: align crops so fixed pos tables match
        # the synthetic clip (224 train / 256 test defaults differ)
        cfg.DATA.TEST_CROP_SIZE = cfg.DATA.TRAIN_CROP_SIZE
    assert_and_infer_cfg(cfg)

    try:
        base = build_dataset(cfg.TEST.DATASET, cfg, "test")
        _ = base[0]
    except Exception as e:
        print(f"(no dataset: {e}; using synthetic)")
        base = build_dataset("synthetic", cfg, "test")

    bundle = build_model(cfg)
    if cfg.TEST.CHECKPOINT_FILE_PATH and "<" not in cfg.TEST.CHECKPOINT_FILE_PATH:
        bundle = load_test_checkpoint(cfg, bundle)

    tubelet = getattr(bundle.config, "tubelet_size", 2)
    patch_depth = tubelet[0] if isinstance(tubelet, (tuple, list)) else tubelet
    for policy in ("random", "same_class"):
        ds = SplicedDataset(base, policy, patch_depth=patch_depth, num_to_replace=2)
        item = ds[0]
        logits, _ = bundle.module.apply(
            {"params": bundle.params}, jnp.asarray(item["frames"][None])
        )
        arr = np.asarray(logits if not isinstance(logits, tuple) else logits[0])
        print(f"{policy}: label={item['label']} top1={int(arr[0].argmax())}")


if __name__ == "__main__":
    main()
