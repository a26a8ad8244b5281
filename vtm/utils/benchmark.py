"""Device-timing helpers + standalone throughput benchmark (the
tome.utils.benchmark analog — reference tome/utils.py:15-80).

TPU-native timing: remote PJRT backends (e.g. a tunneled chip) may
return immediately from ``block_until_ready``, so wall-clock walls
around async dispatch measure nothing. Instead we chain ``iters``
forward passes inside ONE jitted ``lax.scan`` — each iteration's input
depends on the previous logits via a zero-scaled feedback, so XLA
cannot parallelise or elide them — and synchronise by fetching a
scalar. The host round-trip is measured separately and subtracted.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def host_roundtrip_latency(repeats: int = 3) -> float:
    """Latency of dispatch + scalar fetch for a trivial computation."""
    one = jax.jit(lambda a: a.sum())
    x = jnp.ones((8, 8))
    float(one(x))  # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        float(one(x))
    return (time.perf_counter() - t0) / repeats


def chained_seconds(
    apply_fn: Callable[..., jax.Array],
    x: jax.Array,
    iters: int,
    repeats: int = 2,
    rtt: float | None = None,
    params=None,
) -> float:
    """Seconds for ``iters`` serialized applications of ``apply_fn``,
    timed on-device, best of ``repeats``.

    ``apply_fn`` is ``v -> out`` (params closed over) or, when
    ``params`` is given, ``(params, v) -> out``. ALWAYS pass large
    weight pytrees via ``params`` — a closure bakes them into the HLO
    as constants (hundreds of MB; remote-compile requests reject it).
    """

    def chain(p, v):
        # Every iteration's output is folded into a LIVE accumulator
        # (so it cannot be dead-code-eliminated — a zero-scaled feedback
        # is algebraically simplified away by XLA), and the next
        # iteration's input is barriered against that accumulator (so
        # the loop body cannot be hoisted as loop-invariant).
        def body(carry, _):
            vv, acc = carry
            out = apply_fn(vv) if p is None else apply_fn(p, vv)
            acc = acc + sum(
                jnp.sum(leaf).astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out)
            )
            vv, acc = jax.lax.optimization_barrier((vv, acc))
            return (vv, acc), ()

        (_, acc), _ = jax.lax.scan(body, (v, jnp.float32(0)), None, length=iters)
        return acc

    fn = jax.jit(chain)
    float(fn(params, x))  # compile + one synced run
    if rtt is None:
        rtt = host_roundtrip_latency()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(params, x))
        best = min(best, time.perf_counter() - t0)
    if best <= rtt:
        # the measurement is all host round-trip: silently clamping to
        # ~0 would publish absurd throughput into the bench artifacts —
        # surface it and return the un-corrected floor instead
        import warnings

        warnings.warn(
            f"chained_seconds: chain time {best * 1e3:.2f} ms <= host rtt "
            f"{rtt * 1e3:.2f} ms — below the timing floor; raise iters",
            stacklevel=2,
        )
        return best
    return best - rtt


def benchmark(
    module,
    params,
    input_size: Tuple[int, ...] = (16, 224, 224, 3),
    batch_size: int = 8,
    runs: int = 40,
    throw_out: float = 0.25,
    use_bf16: bool = False,
    verbose: bool = False,
    seed: int = 0,
) -> float:
    """Throughput (clips/sec) of ``module.apply`` on random input.

    API parity with tome.utils.benchmark (runs/throw_out semantics:
    the first ``throw_out`` fraction is warmup). ``use_bf16`` casts the
    input (the module's compute dtype is set at construction).
    """
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.random((batch_size, *input_size), dtype=np.float32),
        dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
    )

    def apply_fn(p, v):
        out = module.apply({"params": p}, v)
        return out[0] if isinstance(out, tuple) else out

    timed_iters = max(1, runs - int(runs * throw_out))
    elapsed = chained_seconds(apply_fn, x, timed_iters, params=params)
    throughput = batch_size * timed_iters / elapsed
    if verbose:
        print(f"Throughput: {throughput:.2f} clips/s")
    return throughput
