#!/usr/bin/env python3
"""ViViT merge-source visualisation (reference: notebooks/vivit_example.ipynb).

Flow: build ViViT from a config -> (optionally) load a converted
checkpoint -> run one clip with trace_source=True -> render the
spatio-temporal merge groups -> save a frame-grid png.

Usage:
  python examples/vivit_example.py --cfg configs/vivit/kinetics/tome_vivit_8x32_224.yaml \
      [--opts TEST.CHECKPOINT_FILE_PATH /path/ckpt.pyth DATA.PATH_TO_DATA_DIR /data/k400] \
      [--out vivit_vis.png] [--r 300]

Without a dataset/checkpoint it falls back to a random clip + random
weights (the visualisation pipeline still runs end-to-end).
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vtm.checkpoints.checkpoint import load_test_checkpoint  # noqa: E402
from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.models import build_model  # noqa: E402
from vtm.vis.vis import (  # noqa: E402
    concatenate_images,
    make_spatiotemporal_video_visualization,
)


def load_clip(cfg) -> np.ndarray:
    """First test clip if a dataset is configured, else random."""
    try:
        from vtm.data import construct_loader

        loader = construct_loader(cfg, "test")
        item = loader.dataset[0]
        return item["frames"][None]
    except Exception as e:  # no dataset available
        print(f"(no dataset: {e}; using a random clip)")
        rng = np.random.default_rng(0)
        t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TEST_CROP_SIZE
        return rng.standard_normal((1, t, s, s, 3)).astype(np.float32)


def main():
    args = parse_args()
    repo = pathlib.Path(__file__).resolve().parents[1]
    default_cfg = str(repo / 'configs/vivit/kinetics/tome_vivit_8x32_224.yaml')
    cfg = load_config(args, (args.cfg_files or [default_cfg])[0])
    assert_and_infer_cfg(cfg)
    cfg.TOME.ENABLE = True
    cfg.TOME.TRACE_SOURCE = True

    bundle = build_model(cfg)
    if cfg.TEST.CHECKPOINT_FILE_PATH and "<" not in cfg.TEST.CHECKPOINT_FILE_PATH:
        bundle = load_test_checkpoint(cfg, bundle)

    clip = load_clip(cfg)
    logits, state = bundle.module.apply(
        {"params": bundle.params}, jnp.asarray(clip)
    )
    source = np.asarray(state.source)  # [1, n_final, n_0]
    print(f"final tokens: {source.shape[1]} of {source.shape[2]}")

    c = bundle.config
    frames01 = (clip[0] - clip[0].min()) / (np.ptp(clip[0]) + 1e-8)
    frames_tchw = np.transpose(frames01, (0, 3, 1, 2))
    pt, ph, pw = c.tubelet_size
    images, _ = make_spatiotemporal_video_visualization(
        frames_tchw,
        source[0],
        patch_size=(ph, pw, pt),
        class_token=True,
    )
    t = images.shape[0]
    ncols = 8 if t % 8 == 0 else 4
    sheet = concatenate_images(images, ncols=ncols, nrows=t // ncols)
    out = "vivit_vis.png"
    sheet.save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
