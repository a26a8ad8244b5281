"""CLI argument parsing (reference: slowfast/utils/parser.py:13-94)."""

from __future__ import annotations

import argparse
import sys

from vtm.config.defaults import get_cfg


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="vtm: TPU-native video token-merging train/test pipeline"
    )
    parser.add_argument(
        "--shard_id", type=int, default=0, help="shard id of current machine"
    )
    parser.add_argument(
        "--num_shards", type=int, default=1, help="number of machine shards"
    )
    parser.add_argument(
        "--init_method",
        type=str,
        default="",
        help="multi-host coordinator address (tcp://host:port) -> "
             "jax.distributed.initialize (vtm/parallel/mesh.py)",
    )
    parser.add_argument(
        "--cfg",
        dest="cfg_files",
        action="append",
        default=None,
        help="path(s) to config yaml",
    )
    # reference CLI convention (slowfast/utils/parser.py:57):
    # --opts KEY VALUE [KEY VALUE ...]
    parser.add_argument(
        "--opts",
        dest="opts",
        nargs=argparse.REMAINDER,
        default=None,
        help="config overrides: KEY VALUE pairs",
    )
    if argv is None:
        argv = sys.argv[1:]
    return parser.parse_args(argv)


def load_config(args, path_to_config: str | None = None):
    cfg = get_cfg()
    if path_to_config is not None:
        # allow_new: reference yamls may carry legacy PySlowFast sections
        # (MVIT, BN, ...) we don't model; accept and ignore them.
        cfg.merge_from_file(path_to_config, allow_new=True)
    if getattr(args, "opts", None):
        cfg.merge_from_list(args.opts)
    if hasattr(args, "num_shards") and hasattr(args, "shard_id"):
        cfg.NUM_SHARDS = args.num_shards
        cfg.SHARD_ID = args.shard_id
    if getattr(args, "init_method", ""):
        cfg.INIT_METHOD = args.init_method
    return cfg
