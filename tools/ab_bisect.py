#!/usr/bin/env python3
"""Bisect the ~0.3 ms gap between fa._forward and an identical inline
chain at B8 H12 N1600 d64 bf16 (PROFILE_DECOMP3: prod 1.22 ms vs
clean 0.93 ms for the same kernel math). Variants:

  A_verbatim   inline copy of fa._forward (4-D in, q*scale, per-batch
               bias, out slice+reshape)
  B_sharedbias A with a [1,1,n_pad] bias + (0,0,0) index map
  C_noscale    A without the q*sm_scale elementwise pass
  D_flat       A with [bh,n,d] inputs (no in-graph 4-D reshape)
  E_noslice    A without the out[:, :n] slice + 4-D reshape epilogue

Writes PROFILE_BISECT.json; all work fetched before exit."""
import json, pathlib, sys
import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
from vtm.utils.env import setup_environment  # noqa: E402
setup_environment()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402
from vtm.ops import flash_attention as fa  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402

B, H, D, N_PAD, BLK = 8, 12, 64, 1600, 800


def call_kernel(qs, ks, vs, bias, bias_shared):
    import functools
    h = H
    kernel = functools.partial(fa._kernel_chunked, n_pad=N_PAD, blk_k=BLK)
    bh = qs.shape[0]
    bias_ix = (lambda b_, qi: (0, 0, 0)) if bias_shared else (lambda b_, qi: (b_ // h, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(bh, N_PAD // BLK),
        in_specs=[
            pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_PAD, D), lambda b_, qi: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N_PAD), bias_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK, D), lambda b_, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, N_PAD, D), qs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * N_PAD * N_PAD * D,
            bytes_accessed=(3 * B * H * N_PAD * D + B * H * N_PAD * D) * 2,
            transcendentals=B * H * N_PAD * N_PAD,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(qs, ks, vs, bias)


def variant(name, q4, k4, v4, q3, k3, v3):
    if name == "A_verbatim":
        def f(q_, k_, v_):
            b, h, n, d = q_.shape
            qs = (q_ * 1.0).reshape(b * h, n, d)
            ks = k_.reshape(b * h, n, d)
            vs = v_.reshape(b * h, n, d)
            bias = jnp.zeros((b, 1, N_PAD), jnp.float32)
            out = call_kernel(qs, ks, vs, bias, False)
            return out[:, :n, :].reshape(b, h, n, d)
        return f, (q4, k4, v4)
    if name == "B_sharedbias":
        def f(q_, k_, v_):
            b, h, n, d = q_.shape
            qs = (q_ * 1.0).reshape(b * h, n, d)
            ks = k_.reshape(b * h, n, d)
            vs = v_.reshape(b * h, n, d)
            bias = jnp.zeros((1, 1, N_PAD), jnp.float32)
            out = call_kernel(qs, ks, vs, bias, True)
            return out[:, :n, :].reshape(b, h, n, d)
        return f, (q4, k4, v4)
    if name == "C_noscale":
        def f(q_, k_, v_):
            b, h, n, d = q_.shape
            qs = q_.reshape(b * h, n, d)
            ks = k_.reshape(b * h, n, d)
            vs = v_.reshape(b * h, n, d)
            bias = jnp.zeros((b, 1, N_PAD), jnp.float32)
            out = call_kernel(qs, ks, vs, bias, False)
            return out[:, :n, :].reshape(b, h, n, d)
        return f, (q4, k4, v4)
    if name == "D_flat":
        def f(q_, k_, v_):
            bias = jnp.zeros((B, 1, N_PAD), jnp.float32)
            out = call_kernel(q_ * 1.0, k_, v_, bias, False)
            return out
        return f, (q3, k3, v3)
    if name == "E_noslice":
        def f(q_, k_, v_):
            b, h, n, d = q_.shape
            qs = (q_ * 1.0).reshape(b * h, n, d)
            ks = k_.reshape(b * h, n, d)
            vs = v_.reshape(b * h, n, d)
            bias = jnp.zeros((b, 1, N_PAD), jnp.float32)
            return call_kernel(qs, ks, vs, bias, False)
        return f, (q4, k4, v4)
    raise KeyError(name)


def main():
    from bench import _probe_device
    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    path = REPO / "PROFILE_BISECT.json"

    def record(key, ms):
        out["rows"][key] = {"ms": round(ms, 4)}
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(json.dumps({key: round(ms, 4)}), flush=True)

    rng = np.random.default_rng(0)
    q3 = jnp.asarray(rng.standard_normal((B * H, N_PAD, D)), jnp.bfloat16)
    k3 = jnp.asarray(rng.standard_normal((B * H, N_PAD, D)), jnp.bfloat16)
    v3 = jnp.asarray(rng.standard_normal((B * H, N_PAD, D)), jnp.bfloat16)
    q4 = q3.reshape(B, H, N_PAD, D)
    k4 = k3.reshape(B, H, N_PAD, D)
    v4 = v3.reshape(B, H, N_PAD, D)

    for name in ["A_verbatim", "B_sharedbias", "C_noscale", "D_flat", "E_noslice"]:
        f, args = variant(name, q4, k4, v4, q3, k3, v3)
        secs = chained_seconds(lambda a: f(*a), args, 150, rtt=rtt)
        record(name, secs / 150 * 1e3)
    record("prod", chained_seconds(
        lambda a: fa.tome_flash_attention(a[0], a[1], a[2], None, 1.0),
        (q4, k4, v4), 150, rtt=rtt) / 150 * 1e3)


if __name__ == "__main__":
    main()
