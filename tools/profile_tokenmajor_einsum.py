#!/usr/bin/env python3
"""A/B head-major vs token-major einsum attention at TimeSformer module
shapes (whole module: qkv dense -> attention -> proj, so XLA's fusion
context is realistic).

Head-major (current attention_core): split_heads/merge_heads transposes
around einsum 'bhqd,bhkd->bhqk'. Token-major: q/k/v stay [B, N, H, d]
(a free reshape of the qkv output) and the einsums are
'bqhd,bkhd->bhqk' / 'bhqk,bkhd->bqhd' — no explicit transposes.

Shapes: temporal [1568, 8, 768] (the (b p) t fold at ViT-B/224 f8 B8)
and spatial [64, 197, 768] (the (b t) fold), biased and unbiased.
Writes PROFILE_TOKENMAJOR.json.
"""

import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vtm.utils.env import setup_environment  # noqa: E402

setup_environment()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import nn  # noqa: E402

from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402

H, D = 12, 768
HD = D // H
SCALE = HD**-0.5


def head_major(x, wqkv, wproj, key_bias=None, excl=False):
    b, n, _ = x.shape
    qkv = x @ wqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (
        jnp.transpose(z.reshape(b, n, H, HD), (0, 2, 1, 3)) for z in (q, k, v)
    )
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * SCALE, k, preferred_element_type=jnp.float32
    )
    if key_bias is not None:
        add = key_bias[:, None, None, :]
        if excl:
            row = (jnp.arange(n) > 0).astype(jnp.float32)[None, None, :, None]
            add = row * add
        logits = logits + add
    probs = nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, D)
    return out @ wproj


def token_major(x, wqkv, wproj, key_bias=None, excl=False):
    b, n, _ = x.shape
    qkv = x @ wqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (z.reshape(b, n, H, HD) for z in (q, k, v))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * SCALE, k, preferred_element_type=jnp.float32
    )
    if key_bias is not None:
        add = key_bias[:, None, None, :]
        if excl:
            row = (jnp.arange(n) > 0).astype(jnp.float32)[None, None, :, None]
            add = row * add
        logits = logits + add
    probs = nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, D)
    return out @ wproj


def main():
    rng = np.random.default_rng(0)
    rtt = host_roundtrip_latency()
    iters = 50
    results = {"device": str(jax.devices()[0]), "iters": iters}
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)

    cases = [
        ("temporal_1568x8", 1568, 8, False, False),
        ("spatial_64x197_unbiased", 64, 197, False, False),
        ("spatial_64x197_biased", 64, 197, True, True),
        ("spatial_64x125_biased", 64, 125, True, True),
    ]
    for name, b, n, biased, excl in cases:
        x = jnp.asarray(rng.standard_normal((b, n, D)), jnp.bfloat16)
        kb = (
            jnp.asarray(np.log(rng.uniform(1, 5, (b, n))), jnp.float32)
            if biased
            else None
        )
        row = {}
        for tag, fn in (("head_major", head_major), ("token_major", token_major)):
            secs = chained_seconds(
                lambda z, _f=fn, _b=biased, _e=excl: _f(
                    z[0], wqkv, wproj, z[1] if _b else None, _e
                ),
                (x, kb if kb is not None else jnp.zeros((1,), jnp.float32)),
                iters,
                rtt=rtt,
            )
            row[tag + "_ms"] = round(secs / iters * 1e3, 4)
        results[name] = row
        print(name, row, flush=True)

    (REPO / "PROFILE_TOKENMAJOR.json").write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
