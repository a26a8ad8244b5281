#!/usr/bin/env python3
"""Whole-program A/B of the merge machinery's sub-steps.

PROFILE_RATIO_DECOMP.json pins the merged headline's excess over the
FLOP-ideal ratio almost entirely on "merge machinery" (~1.9 ms of the
16.2 ms merged program) — 4x what the noisy per-layer profile
suggested. This tool splits that budget by timing the WHOLE merged
VideoMAE program (batch 8, r=150) with machinery pieces replaced by
shape-preserving no-ops (timing-only; numerics intentionally garbage):

  prod         production program
  fixed_match  bipartite_soft_matching returns precomputed constant
               index Matchings -> matcher cost (normalize + fp32
               scores matmul + rowmax/argmax + argsort) removed,
               merge application kept
  slice_merge  merge_wavg returns x[:, :n-r] -> merge application
               (gathers + one-hot contractions + concats) removed,
               matcher kept
  both_free    both replacements -> total machinery (cross-check
               against the ratio-decomp's 1.9 ms)
  no_argsort   argsort(-node_max) replaced by a static iota ->
               isolates the [B, ta] TPU sort network
  bf16_scores  matcher scores in bf16 default-precision (parity
               forbids shipping this) -> bounds the fp32-HIGHEST
               premium a fused matcher kernel could NOT recover

All variants run interleaved in one process, two passes, per-variant
minimum (chip-drift guard). Writes PROFILE_MACHINERY.json.
Run: python tools/ab_machinery.py   (real TPU, ~10 min cold)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vtm.utils.env import setup_environment  # noqa: E402

setup_environment()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vtm.merge import bipartite  # noqa: E402
from vtm.merge.bipartite import Matching, _effective_r  # noqa: E402
from vtm.merge.policy import MergePolicy  # noqa: E402
from vtm.models.videomae import VideoMAE, VideoMAEConfig  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402

_ORIG_MATCH = bipartite.bipartite_soft_matching
_ORIG_WAVG = bipartite.merge_wavg
_ORIG_SCORES = bipartite._scores


def _fixed_matching(metric, r, class_token=False, distill_token=False,
                    mode="merge", rng=None):
    """Constant-index Matching (host-precomputed per (n, r))."""
    b, n, _ = metric.shape
    reff = _effective_r(n, r, class_token, distill_token)
    if reff <= 0:
        return None
    ta, tb = n - n // 2, n // 2
    host = np.random.default_rng(n)  # deterministic per layer shape
    perm = host.permutation(ta)
    src = np.broadcast_to(perm[:reff], (b, reff))
    unm = np.broadcast_to(np.sort(perm[reff:]), (b, ta - reff))
    dst = np.broadcast_to(host.integers(0, tb, reff), (b, reff))
    return Matching(
        unm_idx=jnp.asarray(unm, jnp.int32),
        src_idx=jnp.asarray(src, jnp.int32),
        dst_idx=jnp.asarray(dst, jnp.int32),
        src_score=jnp.ones((b, reff), jnp.float32),
        n=n,
        r=reff,
        distill_token=distill_token,
    )


def _slice_wavg(m, x, size=None, threshold=None):
    if size is None:
        size = jnp.ones(x.shape[:2] + (1,), jnp.float32)
    if m is None:
        return x, size
    out = m.out_tokens
    return x[:, :out], size[:, :out]


def _no_argsort_match(metric, r, class_token=False, distill_token=False,
                      mode="merge", rng=None):
    """Production matcher with argsort(-node_max) -> static iota."""
    n = metric.shape[1]
    reff = _effective_r(n, r, class_token, distill_token)
    if reff <= 0:
        return None
    scores = _ORIG_SCORES(metric, mode, class_token, distill_token, rng)
    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1)
    ta = node_max.shape[1]
    edge_idx = jnp.broadcast_to(
        jnp.arange(ta, dtype=jnp.int32)[None], node_max.shape
    )
    src_idx = edge_idx[:, :reff]
    unm_idx = edge_idx[:, reff:]
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)
    src_score = jnp.take_along_axis(node_max, src_idx, axis=-1)
    return Matching(
        unm_idx=unm_idx, src_idx=src_idx, dst_idx=dst_idx,
        src_score=src_score, n=n, r=reff, distill_token=distill_token,
    )


def _bf16_scores(metric, mode, class_token, distill_token, rng):
    b, n, _ = metric.shape
    if mode.startswith("random"):
        return _ORIG_SCORES(metric, mode, class_token, distill_token, rng)
    m = metric.astype(jnp.bfloat16)
    m = m / jnp.linalg.norm(m.astype(jnp.float32), axis=-1, keepdims=True).astype(
        jnp.bfloat16
    )
    a, bm = m[:, ::2, :], m[:, 1::2, :]
    scores = jax.lax.dot_general(
        a, bm, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if class_token:
        scores = scores.at[:, 0, :].set(-jnp.inf)
    if distill_token:
        scores = scores.at[:, :, 0].set(-jnp.inf)
    return scores


VARIANTS = {
    "prod": {},
    "fixed_match": {"bipartite_soft_matching": _fixed_matching},
    "slice_merge": {"merge_wavg": _slice_wavg},
    "both_free": {
        "bipartite_soft_matching": _fixed_matching,
        "merge_wavg": _slice_wavg,
    },
    "no_argsort": {"bipartite_soft_matching": _no_argsort_match},
    "bf16_scores": {"_scores": _bf16_scores},
}


def main():
    from bench import _probe_device

    _probe_device()
    batch = int(os.environ.get("VTM_PROFILE_BATCH", "8"))
    iters = int(os.environ.get("VTM_PROFILE_ITERS", "20"))
    r = 150
    config = VideoMAEConfig(num_classes=400)
    policy = MergePolicy(rs=(r,) * 12, mode="merge", prop_attn=False)
    model = VideoMAE(config=config, policy=policy, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((batch, 16, 224, 224, 3)), jnp.float32
    )
    params = model.init(jax.random.key(0), video[:1])["params"]
    rtt = host_roundtrip_latency()

    fns = {}
    for name, patches in VARIANTS.items():
        def make(patches):
            def fwd(p, v):
                saved = {k: getattr(bipartite, k) for k in patches}
                try:
                    for k, fn in patches.items():
                        setattr(bipartite, k, fn)
                    return model.apply({"params": p}, v)[0]
                finally:
                    for k, fn in saved.items():
                        setattr(bipartite, k, fn)
            return fwd

        fns[name] = make(patches)

    ms = {k: float("inf") for k in fns}
    for rep in range(2):
        for name, fn in fns.items():
            secs = chained_seconds(fn, video, iters, rtt=rtt, params=params)
            ms[name] = min(ms[name], secs / iters * 1e3)
            print(json.dumps({"rep": rep, name: round(ms[name], 3)}), flush=True)

    out = dict(
        device=str(jax.devices()[0]),
        batch=batch,
        iters=iters,
        r=r,
        ms={k: round(v, 3) for k, v in ms.items()},
        split_ms=dict(
            matcher=round(ms["prod"] - ms["fixed_match"], 3),
            merge_apply=round(ms["prod"] - ms["slice_merge"], 3),
            machinery_total=round(ms["prod"] - ms["both_free"], 3),
            argsort=round(ms["prod"] - ms["no_argsort"], 3),
            fp32_highest_premium=round(ms["prod"] - ms["bf16_scores"], 3),
        ),
        note=(
            "timing-only variants (numerics intentionally wrong); "
            "splits overlap — matcher+merge_apply need not sum to "
            "machinery_total because XLA fuses differently per variant"
        ),
    )
    (REPO / "PROFILE_MACHINERY.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
