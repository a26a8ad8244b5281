#!/usr/bin/env python3
"""Data-loading throughput benchmark (reference: tools/benchmark.py +
slowfast/utils/benchmark.py:20-103): iterate the train loader for
BENCHMARK.NUM_EPOCHS without any model, reporting batches/sec."""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from vtm.config import assert_and_infer_cfg, load_config, parse_args  # noqa: E402
from vtm.data import construct_loader, shuffle_dataset  # noqa: E402
from vtm.utils.logging import get_logger, log_json_stats, setup_logging  # noqa: E402

logger = get_logger(__name__)


def benchmark_data_loading(cfg) -> dict:
    setup_logging(cfg.OUTPUT_DIR)
    loader = construct_loader(cfg, "train")
    if not cfg.BENCHMARK.SHUFFLE:
        loader.shuffle = False
    total_batches = 0
    total_clips = 0  # actual sizes (multigrid short-cycle batches vary)
    start = time.perf_counter()
    for epoch in range(cfg.BENCHMARK.NUM_EPOCHS):
        shuffle_dataset(loader, epoch)
        epoch_start = time.perf_counter()
        for cur_iter, batch in enumerate(loader):
            total_batches += 1
            total_clips += len(batch["index"])
            if (cur_iter + 1) % cfg.BENCHMARK.LOG_PERIOD == 0:
                log_json_stats(
                    {
                        "split": "data_benchmark_iter",
                        "epoch": epoch,
                        "iter": cur_iter + 1,
                        "batches_per_sec": (cur_iter + 1)
                        / (time.perf_counter() - epoch_start),
                    },
                    logger,
                )
    elapsed = time.perf_counter() - start
    import resource

    # peak RSS in bytes (the reference reports RAM usage, utils/benchmark.py)
    peak_rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    stats = {
        "split": "data_benchmark",
        "total_batches": total_batches,
        "batches_per_sec": total_batches / elapsed,
        "clips_per_sec": total_clips / elapsed,
        "peak_rss_bytes": peak_rss,
    }
    log_json_stats(stats, logger)
    return stats


def main():
    args = parse_args()
    for path in args.cfg_files or [None]:
        cfg = load_config(args, path)
        assert_and_infer_cfg(cfg)
        benchmark_data_loading(cfg)


if __name__ == "__main__":
    main()
