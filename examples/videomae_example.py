#!/usr/bin/env python3
"""VideoMAE merge-source visualisation (reference:
notebooks/videomae_example.ipynb — r=150, class_token=False).

Usage:
  python examples/videomae_example.py --cfg configs/videomae/kinetics/tome_VideoMAE_B_16_224_K400.yaml \
      [--opts TEST.CHECKPOINT_FILE_PATH ... ] [--out videomae_vis.png]
Falls back to random clip/weights without a dataset/checkpoint.
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
from vtm.vis.vis import (  # noqa: E402
    concatenate_images,
    make_spatiotemporal_video_visualization,
)
from examples.vivit_example import load_clip  # noqa: E402


def main():
    args = parse_args()
    repo = pathlib.Path(__file__).resolve().parents[1]
    default_cfg = str(repo / 'configs/videomae/kinetics/tome_VideoMAE_B_16_224_K400.yaml')
    cfg = load_config(args, (args.cfg_files or [default_cfg])[0])
    cfg.MODEL.MODEL_NAME = "VideoMAE"
    assert_and_infer_cfg(cfg)
    cfg.TOME.ENABLE = True
    cfg.TOME.TRACE_SOURCE = True

    bundle = build_model(cfg)
    if cfg.TEST.CHECKPOINT_FILE_PATH and "<" not in cfg.TEST.CHECKPOINT_FILE_PATH:
        bundle = load_test_checkpoint(cfg, bundle)

    clip = load_clip(cfg)
    _, state = bundle.module.apply({"params": bundle.params}, jnp.asarray(clip))
    source = np.asarray(state.source)
    print(f"final tokens: {source.shape[1]} of {source.shape[2]}")

    c = bundle.config
    frames01 = (clip[0] - clip[0].min()) / (np.ptp(clip[0]) + 1e-8)
    frames_tchw = np.transpose(frames01, (0, 3, 1, 2))
    images, _ = make_spatiotemporal_video_visualization(
        frames_tchw,
        source[0],
        patch_size=(c.patch_size, c.patch_size, c.tubelet_size),
        class_token=False,  # VideoMAE has no CLS token
    )
    t = images.shape[0]
    ncols = 8 if t % 8 == 0 else 4
    sheet = concatenate_images(images, ncols=ncols, nrows=t // ncols)
    sheet.save("videomae_vis.png")
    print("wrote videomae_vis.png")


if __name__ == "__main__":
    main()
