#!/usr/bin/env python3
"""Fine-tuning driver (reference: tools/train_net.py).

train(cfg) (reference :646-916): build model + optimizer, auto-resume,
epoch loop with per-iter LR, EPIC dual loss, eval every EVAL_PERIOD,
checkpoint every CHECKPOINT_PERIOD. TPU-native: bf16 module dtype
replaces AMP/GradScaler; data-parallel jit replaces DDP; grad
accumulation via optax.MultiSteps.
"""

from __future__ import annotations

import math
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from vtm.checkpoints import checkpoint as cu  # noqa: E402
from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.data import construct_loader, shuffle_dataset  # noqa: E402
from vtm.eval.meters import (  # noqa: E402
    EPICTrainMeter,
    EPICValMeter,
    TrainMeter,
    ValMeter,
)
from vtm.eval.metrics import (  # noqa: E402
    multitask_topk_accuracies,
    topk_accuracies,
    topk_errors,
)
from vtm.models import build_model  # noqa: E402
from vtm.parallel.mesh import make_mesh, pad_to_multiple, replicate, shard_batch  # noqa: E402
from vtm.train.mixup import MixUp  # noqa: E402
from vtm.train.optimizer import construct_optimizer, set_lr  # noqa: E402
from vtm.train.train_step import make_eval_step, make_train_step  # noqa: E402
from vtm.utils import wandb_utils  # noqa: E402
from vtm.utils.env import setup_environment  # noqa: E402
from vtm.utils.logging import get_logger, setup_logging  # noqa: E402
from vtm.vis.tensorboard_vis import TensorboardWriter  # noqa: E402

logger = get_logger(__name__)


def rotate_chunked_csv(cfg, cur_epoch):
    """Per-epoch chunked-csv rotation (reference tools/train_net.py:793-804):
    epochs walk disjoint ``LOADER_CHUNK_SIZE`` slabs of the overall csv.
    Returns a freshly constructed train loader, or None when rotation is
    off / at epoch 0. ``LOADER_CHUNK_OVERALL_SIZE`` left at 0 is treated as
    a single chunk (the reference crashes with ZeroDivisionError there).
    Like the reference, only the loader is rebuilt — meters and kNN label
    banks keep their epoch-0 construction."""
    if cur_epoch <= 0 or cfg.DATA.LOADER_CHUNK_SIZE <= 0:
        return None
    num_chunks = max(
        math.ceil(
            cfg.DATA.LOADER_CHUNK_OVERALL_SIZE / cfg.DATA.LOADER_CHUNK_SIZE
        ),
        1,
    )
    skip_rows = cur_epoch % num_chunks * cfg.DATA.LOADER_CHUNK_SIZE
    logger.info(
        "chunked csv: epoch %d num_chunks %d skip_rows %d",
        cur_epoch, num_chunks, skip_rows,
    )
    cfg.DATA.SKIP_ROWS = skip_rows
    return construct_loader(cfg, "train")


def _epic_accuracies(logits, labels):
    """((v1,v5),(n1,n5),(a1,a5)) in % (reference train_net.py:223-247)."""
    verb = np.asarray(logits[0])
    noun = np.asarray(logits[1])
    lv = np.asarray(labels["verb"])
    ln = np.asarray(labels["noun"])
    v1, v5 = topk_accuracies(verb, lv, (1, 5))
    n1, n5 = topk_accuracies(noun, ln, (1, 5))
    a1, a5 = multitask_topk_accuracies((verb, noun), (lv, ln), (1, 5))
    return ((v1, v5), (n1, n5), (a1, a5))


def _step_key(seed, cur_epoch, cur_iter):
    """Per-step RNG key. Folds epoch and iter into the base key
    independently instead of the old ``epoch * data_size + iter``
    stride: chunked-csv rotation makes data_size vary when the last
    chunk is smaller, so a length-based stride can map different
    (epoch, iter) pairs to the same key and silently reuse
    dropout/noise randomness across epochs."""
    key = jax.random.key(seed)
    return jax.random.fold_in(jax.random.fold_in(key, cur_epoch), cur_iter)


def _labels_of(batch, multi_head):
    if multi_head:
        return {
            "verb": jnp.asarray(batch["label"]["verb"]),
            "noun": jnp.asarray(batch["label"]["noun"]),
        }
    return jnp.asarray(batch["label"])


def train_epoch(
    loader, train_step, params, opt_state, lr_at, cur_epoch, meter, cfg, mesh,
    multi_head, mixup_fn=None, tb_writer=None, bn_stats=None, bundle_spec=None
):
    data_size = len(loader)
    meter.iter_tic()
    for cur_iter, batch in enumerate(loader):
        lr = lr_at(cur_epoch + float(cur_iter) / data_size)
        set_lr(opt_state, lr)
        if mixup_fn is not None:
            mixed, targets = mixup_fn(
                np.asarray(batch["frames"]), np.asarray(batch["label"])
            )
            frames = shard_batch(mesh, jnp.asarray(mixed))
            labels = jnp.asarray(targets)
        elif cfg.DETECTION.ENABLE or cfg.MASK.ENABLE:
            # detection/maskfeat steps are single-device jit — no mesh
            # batch sharding
            frames = jnp.asarray(batch["frames"])
            labels = None
        else:
            frames = shard_batch(mesh, jnp.asarray(batch["frames"]))
            labels = _labels_of(batch, multi_head)
        meter.data_toc()
        if cfg.MASK.ENABLE:
            step_rng = _step_key(cfg.RNG_SEED, cur_epoch, cur_iter)
            if cfg.MASK.MAE_ON:
                # the MAE step computes pixel labels in-graph
                params, opt_state, loss, _ = train_step(
                    params, opt_state, frames,
                    jnp.asarray(batch["mask"]), step_rng,
                )
            else:
                from vtm.models.masked import (
                    maskfeat_hog_labels, maskfeat_pixel_labels,
                )

                label_fn = (
                    maskfeat_hog_labels
                    if cfg.MASK.PRED_HOG
                    else lambda spec, depths, fr: maskfeat_pixel_labels(
                        spec, depths, fr,
                        time_stride_loss=cfg.MASK.TIME_STRIDE_LOSS,
                        norm=cfg.MASK.NORM_PRED_PIXEL,
                    )
                )
                mask_labels = [
                    jnp.asarray(l)
                    for l in label_fn(
                        bundle_spec, cfg.MASK.PRETRAIN_DEPTH,
                        np.asarray(batch["frames"]),
                    )
                ]
                params, opt_state, loss, _ = train_step(
                    params, opt_state, frames, jnp.asarray(batch["mask"]),
                    mask_labels, step_rng,
                )
            loss = float(loss)
            if cfg.TRAIN.KILL_LOSS_EXPLOSION_FACTOR and not np.isfinite(loss):
                raise RuntimeError(f"NaN/inf loss at epoch {cur_epoch} iter {cur_iter}")
            meter.iter_toc()
            meter.update_stats(0.0, 0.0, loss, lr, batch["frames"].shape[0])
            meter.log_iter_stats(cur_epoch, cur_iter)
            meter.iter_tic()
            continue
        if cfg.DETECTION.ENABLE:
            boxes = np.asarray(batch["boxes"], np.float32)
            n_boxes = len(boxes)
            padded_n = max(8, int(-(-n_boxes // 8) * 8))
            det_labels = np.asarray(batch["label"], np.float32)
            weights = np.ones(padded_n, np.float32)
            if padded_n != n_boxes:
                boxes = np.concatenate(
                    [boxes, np.zeros((padded_n - n_boxes, 5), np.float32)]
                )
                det_labels = np.concatenate(
                    [det_labels,
                     np.zeros((padded_n - n_boxes, det_labels.shape[1]), np.float32)]
                )
                weights[n_boxes:] = 0.0
            params, bn_stats, opt_state, loss, _ = train_step(
                params, bn_stats, opt_state, frames, jnp.asarray(boxes),
                jnp.asarray(det_labels), jnp.asarray(weights),
                _step_key(cfg.RNG_SEED, cur_epoch, cur_iter),
            )
            loss = float(loss)
            if cfg.TRAIN.KILL_LOSS_EXPLOSION_FACTOR and not np.isfinite(loss):
                raise RuntimeError(f"NaN/inf loss at epoch {cur_epoch} iter {cur_iter}")
            meter.iter_toc()
            meter.update_stats(None, None, None, loss, lr)
            meter.log_iter_stats(cur_iter)
            meter.iter_tic()
            continue
        if bn_stats is not None:
            params, bn_stats, opt_state, loss, logits, aux = train_step(
                params, bn_stats, opt_state, frames, labels,
                _step_key(cfg.RNG_SEED, cur_epoch, cur_iter),
            )
        else:
            params, opt_state, loss, logits, aux = train_step(
                params, opt_state, frames, labels,
                _step_key(cfg.RNG_SEED, cur_epoch, cur_iter),
            )
        loss = float(loss)
        if cfg.TRAIN.KILL_LOSS_EXPLOSION_FACTOR and not np.isfinite(loss):
            raise RuntimeError(f"NaN/inf loss at epoch {cur_epoch} iter {cur_iter}")
        mb = batch["frames"].shape[0]
        meter.iter_toc()
        if multi_head:
            accs = _epic_accuracies(logits, batch["label"])
            meter.update_stats(accs, (float(aux[0]), float(aux[1]), loss), lr, mb)
        elif cfg.DATA.MULTI_LABEL:
            # charades: loss only, epoch metric is the val mAP
            # (reference train_net.py:286-293)
            meter.update_stats(None, None, loss, lr, mb)
        else:
            top1_err, top5_err = topk_errors(
                np.asarray(logits), np.asarray(batch["label"]), (1, 5)
            )
            meter.update_stats(top1_err, top5_err, loss, lr, mb)
        if tb_writer is not None:
            tb_writer.add_scalars(
                {"Train/loss": loss, "Train/lr": lr},
                global_step=data_size * cur_epoch + cur_iter,
            )
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()
    meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return params, opt_state, bn_stats


def eval_epoch(loader, eval_step, params, meter, cur_epoch, cfg, multi_head,
               bn_stats=None):
    meter.iter_tic()
    for cur_iter, batch in enumerate(loader):
        frames, n_valid = pad_to_multiple(batch["frames"], cfg.TRAIN.BATCH_SIZE)
        meter.data_toc()
        if bn_stats is not None:
            logits = eval_step(params, bn_stats, jnp.asarray(frames))
        else:
            logits = eval_step(params, jnp.asarray(frames))
        meter.iter_toc()
        if multi_head:
            trimmed = (np.asarray(logits[0])[:n_valid], np.asarray(logits[1])[:n_valid])
            meter.update_stats(_epic_accuracies(trimmed, batch["label"]), n_valid)
        elif cfg.DATA.MULTI_LABEL:
            # gather predictions; the epoch metric is mAP
            # (reference train_net.py:508-510, 544)
            meter.update_predictions(
                np.asarray(logits)[:n_valid], np.asarray(batch["label"])
            )
        else:
            top1_err, top5_err = topk_errors(
                np.asarray(logits)[:n_valid], np.asarray(batch["label"]), (1, 5)
            )
            meter.update_stats(top1_err, top5_err, n_valid)
        meter.iter_tic()
    meter.log_epoch_stats(cur_epoch)
    meter.reset()


def train_contrastive(cfg):
    """Contrastive SSL pretraining loop (reference train_net.py
    ContrastiveModel path: contrastive_forward + parameter surgery +
    queue warm-up + kNN eval). State (queue/ptr/momentum encoder/knn
    bank) is an explicit pytree threaded through the jitted step."""
    import jax
    import jax.numpy as jnp

    from vtm.models.contrastive import (
        build_contrastive_model,
        knn_predict,
        l2_normalize,
        moco_iters_noupdate,
    )
    from vtm.train.train_step import make_contrastive_train_step

    setup_environment()
    from vtm.parallel.mesh import init_distributed

    init_distributed(cfg)
    setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    logger.info("SSL train with config:\n%s", cfg.dump())

    model, bundle = build_contrastive_model(cfg)
    cc = model.cc
    all_params = {"backbone": bundle.params}
    if cc.type == "swav":
        all_params["swav_prototypes"] = model.init_swav_prototypes(
            jax.random.key(cfg.RNG_SEED + 1)
        )
    stats = bundle.batch_stats
    state = model.init_state(
        bundle.params, stats, jax.random.key(cfg.RNG_SEED)
    )
    tx, lr_at = construct_optimizer(cfg, all_params)
    opt_state = tx.init(all_params)
    step = make_contrastive_train_step(model, tx)

    # auto-resume with the FULL SSL state (queue/ptr/momentum encoder/
    # kNN bank ride the checkpoint's batch_stats slot; the reference
    # saves them as module buffers inside model_state)
    start_epoch = 0
    if cfg.TRAIN.AUTO_RESUME and cu.get_last_checkpoint(cfg.OUTPUT_DIR):
        last = cu.get_last_checkpoint(cfg.OUTPUT_DIR)
        aux_template = {
            "bn": stats if stats is not None else {},
            "ssl_state": state,
        }
        all_params, restored_opt, start_epoch, aux = cu.load_checkpoint(
            last, all_params, opt_state, batch_stats_template=aux_template
        )
        if restored_opt is not None:
            opt_state = restored_opt
        if aux is not None:
            stats = aux["bn"] or None
            state = aux["ssl_state"]
        start_epoch += 1
        logger.info("SSL auto-resumed from %s (epoch %d)", last, start_epoch)

    train_loader = construct_loader(cfg, "train")
    data_size = len(train_loader)
    # knn label bank (reference init_knn_labels, contrastive.py:145-160)
    train_labels = np.asarray(
        getattr(train_loader.dataset, "_labels", np.zeros(cc.length)),
        np.int64,
    )
    iters_nu = (
        moco_iters_noupdate(cc, cfg.TRAIN.BATCH_SIZE)
        if cc.type == "moco"
        else 0
    )
    meter = TrainMeter(data_size, cfg)
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        rotated = rotate_chunked_csv(cfg, cur_epoch)
        if rotated is not None:
            # the reference's single train loop rotates chunks for the
            # SSL path too; meter and kNN label bank keep epoch-0 state
            train_loader = rotated
            data_size = len(train_loader)
        shuffle_dataset(train_loader, cur_epoch)
        meter.iter_tic()
        for cur_iter, batch in enumerate(train_loader):
            epoch_exact = cur_epoch + float(cur_iter) / data_size
            lr = lr_at(epoch_exact)
            set_lr(opt_state, lr)
            clips_arr = np.asarray(batch["clips"], np.float32)
            clips = [
                [jnp.asarray(clips_arr[:, i])]
                for i in range(clips_arr.shape[1])
            ]
            index = jnp.asarray(
                np.asarray(batch["index"]) % cc.length
            )
            meter.data_toc()
            update = not (
                cc.type == "moco"
                and cur_iter < iters_nu
                and epoch_exact < 1
            )
            all_params, stats, state, opt_state, loss, _ = step(
                all_params, stats, state, opt_state, clips, index,
                epoch_exact,
                _step_key(cfg.RNG_SEED, cur_epoch, cur_iter),
                update_param=update,
            )
            loss = float(loss)
            if cfg.TRAIN.KILL_LOSS_EXPLOSION_FACTOR and not np.isfinite(loss):
                raise RuntimeError(
                    f"NaN/inf SSL loss at epoch {cur_epoch} iter {cur_iter}"
                )
            meter.iter_toc()
            meter.update_stats(0.0, 0.0, loss, lr,
                               clips_arr.shape[0])
            meter.log_iter_stats(cur_epoch, cur_iter)
            meter.iter_tic()
        meter.log_epoch_stats(cur_epoch)
        meter.reset()
        if (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0 or (
            cur_epoch + 1
        ) == cfg.SOLVER.MAX_EPOCH:
            # full all_params (incl. swav_prototypes) so opt_state can be
            # restored against the same tree; SSL state rides along
            cu.save_checkpoint(
                cfg.OUTPUT_DIR, all_params, opt_state, cur_epoch, cfg,
                batch_stats={
                    "bn": stats if stats is not None else {},
                    "ssl_state": state,
                },
            )
        # kNN eval (reference train_net.py:437-460)
        if cc.knn_on and (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0:
            val_loader = construct_loader(cfg, "val")
            correct = total = 0
            for batch in val_loader:
                frames = jnp.asarray(np.asarray(batch["frames"], np.float32))
                # eval mode: no dropout, BN running stats (the reference
                # runs kNN eval under model.eval())
                feat = model.backbone_eval(
                    all_params["backbone"], stats, [frames]
                )
                if isinstance(feat, (list, tuple)):
                    feat = feat[0]
                preds = knn_predict(
                    model, state, l2_normalize(feat), train_labels,
                    cc.num_classes_downstream,
                )
                top1 = np.asarray(preds).argmax(axis=1)
                labels = np.asarray(batch["label"])
                correct += int((top1 == labels).sum())
                total += len(labels)
            logger.info(
                "json_stats: {\"_type\": \"ssl_knn_eval\", \"epoch\": %d, "
                "\"knn_top1\": %.4f}", cur_epoch, correct / max(total, 1),
            )
    return all_params


def train(cfg):
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        return train_contrastive(cfg)
    setup_environment()
    from vtm.parallel.mesh import init_distributed

    init_distributed(cfg)
    setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    logger.info("Train with config:\n%s", cfg.dump())

    multigrid = None
    if cfg.MULTIGRID.LONG_CYCLE or cfg.MULTIGRID.SHORT_CYCLE:
        # reference train_net.py:663-668 + 806-830
        from vtm.train.multigrid import MultigridSchedule

        multigrid = MultigridSchedule()
        cfg = multigrid.init_multigrid(cfg)

    bundle = build_model(cfg)
    multi_head = isinstance(bundle.config.num_classes, (tuple, list))
    depth = getattr(bundle.config, "depth", None) or getattr(
        bundle.config, "num_hidden_layers", 12
    )
    tx_base, lr_at = construct_optimizer(cfg, bundle.params, num_layers=depth)
    tx = (
        optax.MultiSteps(tx_base, cfg.SOLVER.ACCUMULATE_STEPS)
        if cfg.SOLVER.ACCUMULATE_STEPS > 1
        else tx_base
    )

    start_epoch = 0
    restored_opt = None
    if cfg.TRAIN.AUTO_RESUME and cu.get_last_checkpoint(cfg.OUTPUT_DIR):
        last = cu.get_last_checkpoint(cfg.OUTPUT_DIR)
        opt_template = tx.init(bundle.params)
        bundle.params, restored_opt, start_epoch, bstats = cu.load_checkpoint(
            last, bundle.params, opt_template,
            batch_stats_template=bundle.batch_stats,
        )
        if bstats is not None:
            bundle.batch_stats = bstats
        start_epoch += 1
        logger.info("Auto-resumed from %s (epoch %d)", last, start_epoch)
    elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
        from vtm.checkpoints.checkpoint import load_test_checkpoint

        saved = cfg.TEST.CHECKPOINT_FILE_PATH
        cfg.TEST.CHECKPOINT_FILE_PATH = cfg.TRAIN.CHECKPOINT_FILE_PATH
        bundle = load_test_checkpoint(cfg, bundle)
        cfg.TEST.CHECKPOINT_FILE_PATH = saved
        if cfg.TRAIN.CHECKPOINT_EPOCH_RESET:
            start_epoch = 0

    # batch_cap picks the largest data-parallel width that divides the
    # batch (the reference-equivalent of choosing NUM_GPUS,
    # defaults.py:1266-1270) so small-batch configs stay runnable on a
    # wide mesh instead of hitting a deep device_put sharding error
    mesh = make_mesh(
        model_parallel=cfg.TPU.MODEL_PARALLEL, batch_cap=cfg.TRAIN.BATCH_SIZE
    )
    if cfg.TPU.MODEL_PARALLEL > 1:
        from vtm.parallel.sharding import shard_params, tp_param_specs

        specs = tp_param_specs(bundle.params)
        params = shard_params(mesh, bundle.params, specs)
    else:
        specs = None
        params = replicate(mesh, bundle.params)
    opt_state = restored_opt if restored_opt is not None else tx.init(params)
    bn_stats = bundle.batch_stats
    if bn_stats is not None:
        bn_stats = replicate(mesh, bn_stats)
    if cfg.MASK.ENABLE:
        if cfg.MASK.MAE_ON:
            from vtm.train.train_step import make_mae_train_step

            train_step = make_mae_train_step(bundle.module, tx)
        else:
            from vtm.train.train_step import make_maskfeat_train_step

            train_step = make_maskfeat_train_step(bundle.module, tx)
    elif cfg.DETECTION.ENABLE:
        from vtm.train.train_step import make_detection_train_step

        train_step = make_detection_train_step(
            bundle.module, tx, cfg.MODEL.LOSS_FUNC,
        )
    else:
        train_step = make_train_step(
            bundle.module, tx, cfg.MODEL.LOSS_FUNC, multi_head, mesh=mesh,
            param_specs=specs, has_batch_stats=bn_stats is not None,
        )
    if bn_stats is not None:
        from vtm.train.train_step import make_bn_eval_step

        eval_step = make_bn_eval_step(bundle.module, mesh)
    else:
        eval_step = make_eval_step(bundle.module, mesh, param_specs=specs)
    det_eval = None
    if cfg.DETECTION.ENABLE:
        # built ONCE: each make_* call is a fresh jit cache, and bn stats
        # are a per-call argument of the step
        from vtm.train.train_step import make_detection_eval_step

        det_eval = make_detection_eval_step(bundle.module)

    train_loader = construct_loader(cfg, "train")
    val_loader = construct_loader(cfg, "val")
    if cfg.DETECTION.ENABLE:
        from vtm.eval.meters import AVAMeter

        train_meter = AVAMeter(len(train_loader), cfg, "train")
        val_meter = AVAMeter(len(val_loader), cfg, "val")
        val_meter.video_idx_to_name = val_loader.dataset._video_idx_to_name
    elif multi_head:
        train_meter = EPICTrainMeter(len(train_loader), cfg)
        val_meter = EPICValMeter(len(val_loader), cfg)
    else:
        train_meter = TrainMeter(len(train_loader), cfg)
        val_meter = ValMeter(len(val_loader), cfg)

    mixup_fn = None
    if cfg.MIXUP.ENABLE and not multi_head:
        mixup_fn = MixUp(
            mixup_alpha=cfg.MIXUP.ALPHA,
            cutmix_alpha=cfg.MIXUP.CUTMIX_ALPHA,
            mix_prob=cfg.MIXUP.PROB,
            switch_prob=cfg.MIXUP.SWITCH_PROB,
            label_smoothing=cfg.MIXUP.LABEL_SMOOTH_VALUE,
            num_classes=cfg.MODEL.NUM_CLASSES,
            seed=cfg.RNG_SEED,
        )
    tb_writer = TensorboardWriter(cfg) if cfg.TENSORBOARD.ENABLE else None
    wandb_utils.init(cfg)

    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        rotated = rotate_chunked_csv(cfg, cur_epoch)
        if rotated is not None:
            # the typed meter (Train/EPICTrain/AVA) built above is kept,
            # exactly as the reference does across chunk rotations
            train_loader = rotated
        if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE:
            cfg, changed = multigrid.update_long_cycle(cfg, cur_epoch)
            if changed:
                # rebuild the model spec/loaders for the new base shape;
                # params are shape-independent (conv families), only the
                # BN stat tree re-shapes when NORM_TYPE flips
                from vtm.train.multigrid import adapt_batch_stats

                bundle = build_model(cfg, init=False)
                if bn_stats is not None:
                    sample = jnp.zeros(
                        (2, cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE,
                         cfg.DATA.TRAIN_CROP_SIZE, 3), jnp.float32,
                    )
                    bn_stats = adapt_batch_stats(
                        bundle.module, bn_stats, sample
                    )
                    bn_stats = replicate(mesh, bn_stats)
                train_step = make_train_step(
                    bundle.module, tx, cfg.MODEL.LOSS_FUNC, multi_head,
                    mesh=mesh, param_specs=specs,
                    has_batch_stats=bn_stats is not None,
                )
                if bn_stats is not None:
                    from vtm.train.train_step import make_bn_eval_step

                    eval_step = make_bn_eval_step(bundle.module, mesh)
                else:
                    eval_step = make_eval_step(
                        bundle.module, mesh, param_specs=specs
                    )
                train_loader = construct_loader(cfg, "train")
                # the long-cycle batch size changed => epoch length
                # changed; a stale meter mis-reports ETA/iter totals
                # (reference rebuilds meters in build_trainer)
                train_meter = TrainMeter(len(train_loader), cfg)
        shuffle_dataset(train_loader, cur_epoch)
        params, opt_state, bn_stats = train_epoch(
            train_loader,
            train_step,
            params,
            opt_state,
            lr_at,
            cur_epoch,
            train_meter,
            cfg,
            mesh,
            multi_head,
            mixup_fn=mixup_fn,
            tb_writer=tb_writer,
            bn_stats=bn_stats,
            bundle_spec=getattr(bundle.module, "spec", None),
        )
        is_ckpt = (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0
        is_eval = (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0
        if bn_stats is not None and cfg.BN.USE_PRECISE_STATS and (is_ckpt or is_eval):
            # reference: calculate_and_update_precise_bn FIRST
            # (train_net.py:879-891) — under sub-BN the precise forward
            # refreshes the SPLIT stats, which only reach the eval
            # mean/var through the aggregation below
            from vtm.train.precise_bn import compute_precise_bn_stats

            bn_stats = compute_precise_bn_stats(
                bundle.module, params, bn_stats, train_loader,
                min(cfg.BN.NUM_BATCHES_PRECISE, len(train_loader)),
            )
        if bn_stats is not None and cfg.BN.NORM_TYPE == "sub_batchnorm" and (
            is_ckpt or is_eval
        ):
            # fold per-split running stats into the eval stats
            # (reference aggregate_sub_bn_stats after precise-BN,
            # train_net.py:871-874 + batchnorm_helper.py:73-100)
            from vtm.models.convnet import aggregate_subbn_stats

            bn_stats = aggregate_subbn_stats(bn_stats)
        if is_ckpt:
            cu.save_checkpoint(cfg.OUTPUT_DIR, params, opt_state, cur_epoch, cfg,
                               batch_stats=bn_stats)
        if is_eval and cfg.MASK.ENABLE:
            pass  # maskfeat pretraining has no classification eval
        elif is_eval:
            if cfg.DETECTION.ENABLE:
                from tools.test_net import perform_detection_test

                cur_bn = bn_stats
                perform_detection_test(
                    val_loader,
                    lambda p, f, b: det_eval(p, f, b, batch_stats=cur_bn),
                    params, val_meter, cfg,
                )
                val_meter.reset()
            else:
                eval_epoch(val_loader, eval_step, params, val_meter, cur_epoch,
                           cfg, multi_head, bn_stats=bn_stats)
    if tb_writer is not None:
        tb_writer.close()
    wandb_utils.finish()
    return params


def main():
    args = parse_args()
    for path in args.cfg_files or [None]:
        cfg = load_config(args, path)
        assert_and_infer_cfg(cfg)
        train(cfg)


if __name__ == "__main__":
    main()
