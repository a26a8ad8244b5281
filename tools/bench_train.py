#!/usr/bin/env python3
"""Train-step throughput: merged vs baseline VideoMAE fine-tuning.

The headline bench (bench.py) times inference; this sidecar times the
FULL production training step — forward, backward (through the fused
Pallas attention VJPs and the merge machinery), AdamW update — as one
scan-chained on-device loop whose carry is (params, opt_state), i.e. a
real multi-step training chain (nothing can be hoisted or DCE'd: each
step's loss depends on the previous step's update).

Reference analog: none (the reference never benchmarks training), so
these rows are beyond-parity evidence that merging pays off end-to-end
for fine-tuning too, exercising the same path as
tools/train_net.py::make_train_step.

Writes BENCH_TRAIN.json.
Run: python tools/bench_train.py     (real TPU, ~5 min warm)
Env: VTM_BENCH_BATCH (8), VTM_BENCH_ITERS (10), VTM_BENCH_R (150)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vtm.utils.env import setup_environment  # noqa: E402

setup_environment()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from vtm.merge.policy import MergePolicy  # noqa: E402
from vtm.models.videomae import VideoMAE, VideoMAEConfig  # noqa: E402
from vtm.train.train_step import make_train_step  # noqa: E402
from vtm.utils.benchmark import host_roundtrip_latency  # noqa: E402


def chained_train_seconds(step, params, opt_state, frames, labels, rng,
                          iters: int, rtt: float, repeats: int = 2) -> float:
    """Seconds for ``iters`` serialized train steps, timed on-device.

    The scan carry is (params, opt_state, loss_acc): step i+1 consumes
    step i's updated params, so the whole chain is one dependent
    sequence — XLA cannot parallelize, hoist, or eliminate any step.
    """

    def chain(p0, o0, f, y, k):
        def body(carry, _):
            p, o, acc = carry
            new_p, new_o, loss, _logits, _aux = step(p, o, f, y, k)
            acc = acc + loss.astype(jnp.float32)
            return jax.lax.optimization_barrier((new_p, new_o, acc)), ()

        (p, _o, acc), _ = jax.lax.scan(
            body, (p0, o0, jnp.float32(0)), None, length=iters
        )
        # fold one updated leaf in so the final update is fetch-live
        leaf = jax.tree_util.tree_leaves(p)[0]
        return acc + jnp.sum(leaf).astype(jnp.float32)

    fn = jax.jit(chain)
    float(fn(params, opt_state, frames, labels, rng))  # compile + sync
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(params, opt_state, frames, labels, rng))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9)


def main():
    from bench import _probe_device

    _probe_device()
    batch = int(os.environ.get("VTM_BENCH_BATCH", "8"))
    iters = int(os.environ.get("VTM_BENCH_ITERS", "10"))
    r = int(os.environ.get("VTM_BENCH_R", "150"))
    dtype = jnp.bfloat16

    config = VideoMAEConfig(num_classes=400)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((batch, 16, 224, 224, 3)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 400, size=(batch,)), jnp.int32)
    key = jax.random.key(0)

    tx = optax.adamw(1e-4, weight_decay=0.05)

    def build(policy):
        model = VideoMAE(config=config, policy=policy, dtype=dtype)
        params = model.init(jax.random.key(0), frames[:1])["params"]
        step = make_train_step(model, tx, "cross_entropy", multi_head=False)
        return step, params, tx.init(params)

    base_step, base_params, base_opt = build(
        MergePolicy(rs=(0,) * 12, mode="none")
    )
    merged_step, merged_params, merged_opt = build(
        MergePolicy(rs=(r,) * 12, mode="merge", prop_attn=False)
    )

    rtt = host_roundtrip_latency()

    def cps(step, p, o):
        secs = chained_train_seconds(
            step, p, o, frames, labels, key, iters, rtt
        )
        return batch * iters / secs

    base_cps = cps(base_step, base_params, base_opt)
    merged_cps = cps(merged_step, merged_params, merged_opt)
    # interleaved second pass: per-program best (drift guard, see bench.py)
    base_cps = max(base_cps, cps(base_step, base_params, base_opt))
    merged_cps = max(merged_cps, cps(merged_step, merged_params, merged_opt))

    out = dict(
        device=str(jax.devices()[0]),
        batch=batch,
        iters=iters,
        r=r,
        optimizer="adamw(1e-4, wd=0.05)",
        loss="cross_entropy",
        dtype="bfloat16 activations / float32 params+opt",
        baseline_train_clips_per_sec=round(base_cps, 2),
        merged_train_clips_per_sec=round(merged_cps, 2),
        speedup=round(merged_cps / base_cps, 4),
        note=(
            "fwd+bwd+AdamW per step, scan-chained with (params, opt_state)"
            " carry — each step consumes the previous update; exercises the"
            " fused Pallas attention VJP at every merged token count"
        ),
    )
    (REPO / "BENCH_TRAIN.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
