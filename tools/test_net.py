#!/usr/bin/env python3
"""Multi-view test driver (reference: tools/test_net.py).

Flow (test_net.py:210-402): per NUM_TEMPORAL_CLIPS entry — build model,
load checkpoint, construct loader and meter, run multi-view inference,
ensemble per-video predictions, report top-1/5 (or verb/noun/action).
TPU-native: one process, data-parallel mesh sharding instead of
DDP/all_gather; the per-layer merge schedule is compiled in.
"""

from __future__ import annotations

import pathlib
import pickle
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402

from vtm.checkpoints.checkpoint import load_test_checkpoint  # noqa: E402
from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.data import construct_loader  # noqa: E402
from vtm.eval.meters import EPICTestMeter, TestMeter  # noqa: E402
from vtm.models import build_model  # noqa: E402
from vtm.parallel.mesh import make_mesh, pad_to_multiple, replicate  # noqa: E402
from vtm.train.train_step import make_eval_step  # noqa: E402
from vtm.utils import wandb_utils  # noqa: E402
from vtm.utils.env import setup_environment  # noqa: E402
from vtm.utils.logging import get_logger, setup_logging  # noqa: E402

logger = get_logger(__name__)


def perform_test(loader, eval_step, params, meter, cfg, batch_size: int):
    """(reference test_net.py:27-207)"""
    if cfg.DETECTION.ENABLE:
        return perform_detection_test(loader, eval_step, params, meter, cfg)
    is_epic = cfg.TEST.DATASET.lower() == "epickitchens" or isinstance(
        cfg.EPICKITCHENS.NUM_CLASSES, (list, tuple)
    )
    needs_rng = cfg.TOME.ENABLE and cfg.TOME.MODE in ("random_merge", "random_drop")
    if needs_rng:
        import jax

        base_key = jax.random.key(cfg.RNG_SEED)
    meter.iter_tic()
    for cur_iter, batch in enumerate(loader):
        frames, n_valid = pad_to_multiple(batch["frames"], batch_size)
        meter.data_toc()
        if needs_rng:
            import jax

            logits = eval_step(
                params, jnp.asarray(frames), jax.random.fold_in(base_key, cur_iter)
            )
        else:
            logits = eval_step(params, jnp.asarray(frames))
        if is_epic:
            verb = np.asarray(logits[0])[:n_valid]
            noun = np.asarray(logits[1])[:n_valid]
            meter.iter_toc()
            meter.update_stats(
                (verb, noun),
                (batch["label"]["verb"], batch["label"]["noun"]),
                batch.get("metadata", {}).get("narration_id")
                if isinstance(batch.get("metadata"), dict)
                else None,
                batch["index"],
            )
        else:
            preds = np.asarray(logits)[:n_valid]
            meter.iter_toc()
            meter.update_stats(preds, batch["label"], batch["index"])
        meter.log_iter_stats(cur_iter)
        meter.iter_tic()
    return meter.finalize_metrics()


def perform_detection_test(loader, eval_step, params, meter, cfg):
    """AVA detection loop: pad the box list to a bucketed static count
    (few recompiles), trim, feed the meter with per-box scores."""
    meter.iter_tic()
    for cur_iter, batch in enumerate(loader):
        boxes = np.asarray(batch["boxes"], np.float32)
        n_boxes = len(boxes)
        padded_n = max(8, int(-(-n_boxes // 8) * 8))
        if padded_n != n_boxes:
            pad = np.zeros((padded_n - n_boxes, 5), np.float32)
            boxes = np.concatenate([boxes, pad])
        meter.data_toc()
        logits = eval_step(
            params, jnp.asarray(batch["frames"]), jnp.asarray(boxes)
        )
        preds = np.asarray(logits)[:n_boxes]
        meter.iter_toc()
        meter.update_stats(preds, batch["ori_boxes"], batch["metadata"])
        meter.log_iter_stats(cur_iter)
        meter.iter_tic()
    return meter.finalize_metrics()


def test(cfg):
    setup_environment()
    from vtm.parallel.mesh import init_distributed

    init_distributed(cfg)
    setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)

    views_list = cfg.TEST.NUM_TEMPORAL_CLIPS or [cfg.TEST.NUM_ENSEMBLE_VIEWS]
    if views_list == [-1]:
        views_list = [1, 3, 5, 7, 10]  # reference run_net.py:29-35 sweep
    wandb_utils.init(cfg)
    tb_writer = None
    if cfg.TENSORBOARD.ENABLE:
        from vtm.vis.tensorboard_vis import TensorboardWriter

        tb_writer = TensorboardWriter(cfg)
    results = []
    for num_view in views_list:
        cfg.TEST.NUM_ENSEMBLE_VIEWS = num_view
        bundle = build_model(cfg)
        bundle = load_test_checkpoint(cfg, bundle)
        if cfg.LOG_MODEL_INFO:
            from vtm.utils.model_info import log_model_info

            log_model_info(bundle, cfg)

        mesh = make_mesh(
            model_parallel=cfg.TPU.MODEL_PARALLEL, batch_cap=cfg.TEST.BATCH_SIZE
        )
        if cfg.TPU.MODEL_PARALLEL > 1:
            from vtm.parallel.sharding import shard_params, tp_param_specs

            specs = tp_param_specs(bundle.params)
            params = shard_params(mesh, bundle.params, specs)
        else:
            specs = None
            params = replicate(mesh, bundle.params)
        if cfg.DETECTION.ENABLE:
            from vtm.train.train_step import make_detection_eval_step

            eval_step = make_detection_eval_step(
                bundle.module, batch_stats=bundle.batch_stats
            )
        else:
            eval_step = make_eval_step(
                bundle.module,
                mesh,
                with_rng=cfg.TOME.ENABLE
                and cfg.TOME.MODE in ("random_merge", "random_drop"),
                param_specs=specs,
                batch_stats=bundle.batch_stats,
            )

        loader = construct_loader(cfg, "test")
        # AVA detection evaluates keyframes, not multi-view clips
        num_clips = (
            1
            if cfg.DETECTION.ENABLE
            else cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        )
        assert len(loader.dataset) % num_clips == 0, (
            f"test dataset size {len(loader.dataset)} is not divisible by "
            f"NUM_ENSEMBLE_VIEWS*NUM_SPATIAL_CROPS={num_clips}; check the "
            "test csv / annotations (reference test_net.py:293-297)"
        )
        num_videos = len(loader.dataset) // num_clips
        if cfg.DETECTION.ENABLE:
            from vtm.eval.meters import AVAMeter

            meter = AVAMeter(len(loader), cfg, "test")
            meter.video_idx_to_name = loader.dataset._video_idx_to_name
        elif isinstance(cfg.EPICKITCHENS.NUM_CLASSES, (list, tuple)) or (
            cfg.TEST.DATASET.lower() == "epickitchens"
        ):
            ncls = tuple(cfg.EPICKITCHENS.NUM_CLASSES or (97, 300))
            meter = EPICTestMeter(num_videos, num_clips, ncls, len(loader))
        else:
            meter = TestMeter(
                num_videos,
                num_clips,
                cfg.MODEL.NUM_CLASSES,
                len(loader),
                cfg.DATA.ENSEMBLE_METHOD,
                cfg=cfg,
                multi_label=cfg.DATA.MULTI_LABEL,
            )
        # every device batch must be equal: pad to a fixed size that is
        # a multiple of the DATA axis (only it shards the batch —
        # padding to the whole device count would double the work under
        # tensor parallelism with small batches)
        data_ways = mesh.shape["data"]
        padded_bs = -(-cfg.TEST.BATCH_SIZE // data_ways) * data_ways
        stats = perform_test(loader, eval_step, params, meter, cfg, padded_bs)
        results.append((num_view, stats))
        wandb_utils.log({"num_views": num_view, **{k: v for k, v in stats.items()}})
        # AVAMeter has no per-video preds (detection scores go through
        # finalize_metrics); the vis/save branches below are
        # classification-only
        is_cls = hasattr(meter, "video_preds") or isinstance(
            meter, EPICTestMeter
        )
        if tb_writer is not None and hasattr(meter, "video_preds"):
            tb_writer.plot_eval(meter.video_preds, meter.video_labels)
        if cfg.TEST.SAVE_RESULTS_PATH and is_cls:
            # suffix per sweep entry — a bare path would overwrite the
            # previous views' predictions on every pass
            save_path = cfg.TEST.SAVE_RESULTS_PATH
            if len(views_list) > 1:
                root, dot, ext = save_path.rpartition(".")
                save_path = (
                    f"{root}_views{num_view}.{ext}" if dot else
                    f"{save_path}_views{num_view}"
                )
            with open(save_path, "wb") as f:
                if isinstance(meter, EPICTestMeter):
                    pickle.dump(
                        {
                            "verb": meter.verb_preds,
                            "noun": meter.noun_preds,
                            "verb_labels": meter.verb_labels,
                            "noun_labels": meter.noun_labels,
                        },
                        f,
                    )
                else:
                    pickle.dump(
                        {"preds": meter.video_preds, "labels": meter.video_labels}, f
                    )
    for num_view, stats in results:
        logger.info("views=%d -> %s", num_view, stats)
    if tb_writer is not None:
        tb_writer.close()
    wandb_utils.finish()
    return results


def main():
    args = parse_args()
    for path in args.cfg_files or [None]:
        cfg = load_config(args, path)
        assert_and_infer_cfg(cfg)
        test(cfg)


if __name__ == "__main__":
    main()
