#!/usr/bin/env python3
"""Webcam / file demo (reference: tools/demo_net.py + the
slowfast/visualization demo pipeline, driven by DEMO.* flags).

Reads clips from DEMO.INPUT_VIDEO or DEMO.WEBCAM, runs the (optionally
token-merged) model on each, draws top-k predictions on the frames and
writes them to DEMO.OUTPUT_FILE or the screen.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.utils.env import setup_environment  # noqa: E402
from vtm.utils.logging import get_logger, setup_logging  # noqa: E402
from vtm.vis.demo import (  # noqa: E402
    Predictor,
    ThreadVideoManager,
    VideoManager,
    draw_predictions,
    load_class_names,
)

logger = get_logger(__name__)


def run_demo(cfg) -> int:
    setup_environment()
    setup_logging(cfg.OUTPUT_DIR)
    manager_cls = ThreadVideoManager if cfg.DEMO.THREAD_ENABLE else VideoManager
    manager = manager_cls(cfg).start()
    predictor = Predictor(cfg)
    class_names = load_class_names(cfg.DEMO.LABEL_FILE_PATH)

    # DEMO.NUM_VIS_INSTANCES > 1 fans the host-side drawing out to a
    # multiprocess AsyncVis pool (reference async_predictor.py AsyncVis;
    # inference stays in-process — the TPU-correct topology)
    async_vis = None
    if cfg.DEMO.NUM_VIS_INSTANCES > 1:
        from vtm.vis.async_predictor import AsyncVis
        from vtm.vis.video_visualizer import VideoVisualizer

        video_vis = VideoVisualizer(
            num_classes=cfg.MODEL.NUM_CLASSES,
            class_names=class_names,
            top_k=cfg.DEMO.VIS_TOPK,
            thres=cfg.DEMO.COMMON_CLASS_THRES,
            mode="thres" if cfg.DEMO.VIS_MODE == "thres" else "top-k",
            lower_thres=cfg.DEMO.UNCOMMON_CLASS_THRES,
            common_class_names=cfg.DEMO.COMMON_CLASS_NAMES,
        )
        async_vis = AsyncVis(video_vis, n_workers=cfg.DEMO.NUM_VIS_INSTANCES)

    num_tasks = 0
    try:
        pending = 0
        for task_idx, task in enumerate(manager):
            if cfg.DEMO.NUM_CLIPS_SKIP and task_idx % (cfg.DEMO.NUM_CLIPS_SKIP + 1):
                continue
            task = predictor(task)
            if async_vis is not None:
                task.add_action_preds(task.preds)
                # AsyncVis.put() reassigns sequential ids itself
                # (NUM_CLIPS_SKIP leaves holes in the manager's ids)
                async_vis.put(task)
                pending += 1
                while pending:
                    try:
                        done = async_vis.get()
                    except IndexError:
                        break
                    manager.display(done)
                    pending -= 1
                    num_tasks += 1
            else:
                task = draw_predictions(task, class_names, k=cfg.DEMO.VIS_TOPK)
                manager.display(task)
                num_tasks += 1
        if async_vis is not None:
            import time

            deadline = time.time() + 60
            while pending and time.time() < deadline:
                try:
                    done = async_vis.get()
                except IndexError:
                    time.sleep(0.02)
                    continue
                manager.display(done)
                pending -= 1
                num_tasks += 1
    finally:
        if async_vis is not None:
            async_vis.shutdown()
        manager.join()
        manager.clean()
    logger.info("demo processed %d clips", num_tasks)
    return num_tasks


def main():
    args = parse_args()
    for path in args.cfg_files or [None]:
        cfg = load_config(args, path)
        assert_and_infer_cfg(cfg)
        run_demo(cfg)


if __name__ == "__main__":
    main()
