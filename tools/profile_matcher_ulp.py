#!/usr/bin/env python3
"""Prove or refute the hybrid-precision matcher lever (VERDICT-r4 next
item 3): could the matcher compute bf16 similarity scores and fall back
to fp32 only where decisions are within bf16 error?

The matcher's decisions are (a) the per-src argmax over dst scores and
(b) the FULL descending argsort of per-src best scores — the sorted
order of *unmerged* tokens feeds the next layer's even/odd partition
(vtm/merge/bipartite.py::_match), so every adjacent pair in the sort is
a decision boundary, not just the top-r cut.

This script runs the production merged VideoMAE ViT-B r=150 forward
(random weights — score-gap statistics depend on token count and
metric dim, which are production-real here), captures every layer's
matcher metric, and measures how many of those decisions actually sit
within the bf16-matmul perturbation:

  * argmax flips: rows whose best-dst changes under bf16 scores;
  * sort swaps: adjacent pairs in the fp32-sorted node_max order that
    invert (or tie) under bf16 scores.

If a material fraction of rows is affected, a "recompute only the
uncertain rows in fp32" scheme degenerates to recomputing (nearly)
everything — i.e. the lever is refuted and the fp32-HIGHEST matcher
premium (~0.29 ms, PROFILE_MACHINERY.json) is the floor.

Runs on CPU (the question is numerical, not a timing).
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if jax.default_backend() != "cpu":
    # the axon sitecustomize (PYTHONPATH=/root/.axon_site) pins the TPU
    # backend regardless of JAX_PLATFORMS; this analysis is numerical,
    # must not touch the session TPU (one JAX process at a time —
    # CLAUDE.md), and needs a scrubbed env to run on CPU
    sys.exit(
        "profile_matcher_ulp: refusing to run on the TPU backend — "
        "invoke with a scrubbed env: PYTHONPATH=/root/repo "
        "JAX_PLATFORMS=cpu python tools/profile_matcher_ulp.py"
    )

from vtm.merge.policy import MergePolicy  # noqa: E402
from vtm.models.videomae import VideoMAE, VideoMAEConfig  # noqa: E402


def scores_of(metric, precision):
    m = metric.astype(jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    a, bm = m[:, ::2, :], m[:, 1::2, :]
    if precision == "bf16":
        a, bm = a.astype(jnp.bfloat16), bm.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, bm, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if precision == "fp32" else None,
    )


def main():
    config = VideoMAEConfig(num_classes=400)
    policy = MergePolicy(rs=(150,) * 12, mode="merge", prop_attn=False)
    model = VideoMAE(config=config, policy=policy)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 224, 224, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x[:1])["params"]

    _, state = model.apply(
        {"params": params}, x,
        capture_intermediates=lambda mdl, name: name == "__call__"
        and type(mdl).__name__ == "VideoMAEAttention",
    )
    inter = state["intermediates"]

    report = {"model": "VideoMAE ViT-B r=150, batch 2, random weights",
              "layers": []}
    total_rows = total_argmax_flips = total_pairs = total_swaps = 0
    for i in range(12):
        metric = inter[f"blocks_{i}"]["attn"]["__call__"][0][1]
        s32 = np.asarray(scores_of(metric, "fp32"), np.float64)
        s16 = np.asarray(scores_of(metric, "bf16"), np.float64)

        node_max32 = s32.max(-1)
        node_idx32 = s32.argmax(-1)
        node_idx16 = s16.argmax(-1)
        argmax_flips = int((node_idx32 != node_idx16).sum())
        rows = node_idx32.size

        # fp32 sort order; would bf16 node_max invert any adjacent pair?
        order = np.argsort(-node_max32, axis=-1, kind="stable")
        nm16 = np.take_along_axis(s16.max(-1), order, axis=-1)
        swaps = int((np.diff(nm16, axis=-1) >= 0).sum())  # >= : ties flip too
        pairs = nm16.shape[0] * (nm16.shape[1] - 1)

        gaps = -np.diff(np.take_along_axis(node_max32, order, -1), axis=-1)
        err = np.abs(s16 - s32).max()
        report["layers"].append({
            "layer": i,
            "n_tokens": int(metric.shape[1]),
            "rows": rows,
            "argmax_flips": argmax_flips,
            "argmax_flip_pct": round(100 * argmax_flips / rows, 2),
            "adjacent_pairs": pairs,
            "sort_swaps_under_bf16": swaps,
            "sort_swap_pct": round(100 * swaps / pairs, 2),
            "median_adjacent_gap": float(np.median(gaps)),
            "max_abs_bf16_score_err": float(err),
        })
        total_rows += rows
        total_argmax_flips += argmax_flips
        total_pairs += pairs
        total_swaps += swaps

    report["totals"] = {
        "argmax_flip_pct": round(100 * total_argmax_flips / total_rows, 2),
        "sort_swap_pct": round(100 * total_swaps / total_pairs, 2),
    }
    report["verdict"] = (
        "REFUTED: the bf16 perturbation reorders a material fraction of "
        "the decision boundaries, so a hybrid matcher must recompute "
        "(nearly) all rows in fp32 — no win over fp32-HIGHEST"
        if report["totals"]["sort_swap_pct"] > 1.0
        or report["totals"]["argmax_flip_pct"] > 1.0
        else "VIABLE: decisions are mostly clear of bf16 error; a "
        "hybrid fp32-fallback matcher could preserve exact decisions"
    )
    out = REPO / "PROFILE_MATCHER_ULP.json"
    out.write_text(json.dumps(report, indent=1) + "\n")
    print(json.dumps(report["totals"]))
    print(report["verdict"])


if __name__ == "__main__":
    main()
