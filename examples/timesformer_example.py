#!/usr/bin/env python3
"""TimeSformer / Motionformer per-frame merge-source visualisation
(the reference's notebooks use the spatial variant for these models —
tome/vis.py:81-130).

Usage:
  python examples/timesformer_example.py --cfg configs/timesformer/kinetics/tome_TimeSformer_divST_8x32_224.yaml \
      [--opts TEST.CHECKPOINT_FILE_PATH ...] [MODEL.MODEL_NAME Motionformer]
Falls back to a random clip + random weights without data.
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
    make_spatial_video_visualization,
)
from examples.vivit_example import load_clip  # noqa: E402


def main():
    args = parse_args()
    repo = pathlib.Path(__file__).resolve().parents[1]
    default_cfg = str(repo / 'configs/timesformer/kinetics/tome_TimeSformer_divST_8x32_224.yaml')
    cfg = load_config(args, (args.cfg_files or [default_cfg])[0])
    assert_and_infer_cfg(cfg)
    cfg.TOME.ENABLE = True
    cfg.TOME.TRACE_SOURCE = True
    if not cfg.TOME.R_VALUE:
        cfg.TOME.R_VALUE = 18

    bundle = build_model(cfg)
    if cfg.TEST.CHECKPOINT_FILE_PATH and "<" not in cfg.TEST.CHECKPOINT_FILE_PATH:
        bundle = load_test_checkpoint(cfg, bundle)

    clip = load_clip(cfg)
    _, state = bundle.module.apply({"params": bundle.params}, jnp.asarray(clip))
    # per-frame source: [(B*T_eff), n_final, n_0] (CLS-free for these models)
    source = np.asarray(state.source)
    print(f"per-frame final tokens: {source.shape[1]} of {source.shape[2]}")

    c = bundle.config
    frames01 = (clip[0] - clip[0].min()) / (np.ptp(clip[0]) + 1e-8)
    frames_tchw = np.transpose(frames01, (0, 3, 1, 2))
    t = frames_tchw.shape[0]
    # frames per merge group: TimeSformer merges per actual frame,
    # Motionformer per temporal-patched pseudo-frame
    pt = t // source.shape[0] if source.shape[0] else 1
    images = make_spatial_video_visualization(
        frames_tchw,
        source,
        patch_size=(c.patch_size, c.patch_size, pt),
        class_token=False,
    )
    ncols = 8 if t % 8 == 0 else 4
    sheet = concatenate_images(images, ncols=ncols, nrows=max(1, t // ncols))
    out = f"{bundle.name.lower()}_vis.png"
    sheet.save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
