#!/usr/bin/env python3
"""Model throughput benchmark (reference: tools/model_benchmark.py +
slowfast/utils/model_benchmark.py:20-56): random input batches, warmup
then timed iterations, reports per-frame latency and FPS. CUDA events
become block_until_ready() walls."""

from __future__ import annotations

import pathlib
import sys


import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vtm.checkpoints.checkpoint import load_test_checkpoint  # noqa: E402
from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.models import build_model  # noqa: E402
from vtm.parallel.mesh import make_mesh, replicate, shard_batch  # noqa: E402
from vtm.utils import wandb_utils  # noqa: E402
from vtm.utils.benchmark import chained_seconds  # noqa: E402
from vtm.utils.env import setup_environment  # noqa: E402
from vtm.utils.logging import get_logger, log_json_stats, setup_logging  # noqa: E402

logger = get_logger(__name__)


def perform_benchmark(module, params, cfg, mesh, batch_stats=None) -> dict:
    # batch must divide evenly over the mesh
    n_dev = mesh.devices.size
    batch = -(-cfg.TEST.BATCH_SIZE // n_dev) * n_dev
    t = cfg.DATA.NUM_FRAMES
    s = cfg.DATA.TEST_CROP_SIZE
    rng = np.random.default_rng(cfg.RNG_SEED)
    dummy = shard_batch(
        mesh, jnp.asarray(rng.random((batch, t, s, s, 3), dtype=np.float32))
    )

    iters = max(1, cfg.MODEL_BENCHMARK.ITERATIONS)
    # warmup (compile) happens inside chained_seconds; remote backends
    # don't block in block_until_ready, so timing chains the iterations
    # on-device and synchronises via a scalar fetch.
    def fwd(p, v):
        variables = {"params": p}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return module.apply(variables, v)[0]

    elapsed = chained_seconds(fwd, dummy, iters, params=params)

    trace_dir = cfg.MODEL_BENCHMARK.TRACE_DIR
    if trace_dir:
        # One traced forward for op-level analysis in the TensorBoard/
        # XProf trace viewer. The scalar fetch keeps the device work
        # inside the trace window on remote backends where
        # block_until_ready is a no-op; tracing is best-effort (some
        # tunneled PJRT plugins only emit the host-side timeline).
        try:
            with jax.profiler.trace(trace_dir):
                out = jax.jit(fwd)(params, dummy)
                float(jnp.sum(out))
        except Exception as e:
            trace_dir = ""
            logger.warning("jax.profiler trace failed: %s", e)
        else:
            logger.info("profiler trace written to %s", trace_dir)

    frame_time_ms = elapsed / (batch * t * iters) * 1000.0
    stats = {
        "split": "model_benchmark",
        "avg_frame_time_ms": frame_time_ms,
        "fps": 1000.0 / frame_time_ms,
        "clips_per_sec": batch * iters / elapsed,
        "batch_size": batch,
        "iterations": iters,
    }
    if trace_dir:
        stats["trace_dir"] = trace_dir
    log_json_stats(stats, logger)
    wandb_utils.log(stats)
    return stats


def model_benchmark(cfg) -> dict:
    setup_environment()
    setup_logging(cfg.OUTPUT_DIR)
    wandb_utils.init(cfg)
    bundle = build_model(cfg)
    bundle = load_test_checkpoint(cfg, bundle)
    # same placement as test_net: TP cuts when TPU.MODEL_PARALLEL>1 —
    # benchmarking a replicated layout under a TP config would report
    # numbers for a different program than the config describes
    mesh = make_mesh(
        model_parallel=cfg.TPU.MODEL_PARALLEL, batch_cap=cfg.TEST.BATCH_SIZE
    )
    if cfg.TPU.MODEL_PARALLEL > 1:
        from vtm.parallel.sharding import shard_params

        params = shard_params(mesh, bundle.params)
    else:
        params = replicate(mesh, bundle.params)
    return perform_benchmark(bundle.module, params, cfg, mesh,
                             batch_stats=bundle.batch_stats)


def main():
    args = parse_args()
    for path in args.cfg_files or [None]:
        cfg = load_config(args, path)
        assert_and_infer_cfg(cfg)
        model_benchmark(cfg)


if __name__ == "__main__":
    main()
