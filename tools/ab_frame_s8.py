#!/usr/bin/env python3
"""A/B of VTM_FRAME_S8 (transposed, sublane-aligned per-frame QK) for
the token-major frame kernel, vs the production lane-padded layout.

Motivation: with per-frame merging the key count s takes arbitrary
per-layer values (196, 178, 160, ... at r=18) and the lane-major
layout pads every frame segment to ceil128(s) — up to +30% QK/exp work
at s=196 (pad 256) and worse mid-schedule (s=130 -> 256). The s8
layout pads to ceil8(s) at the cost of lane-padding the q-block dim
(784 -> 896 internal). Only a measurement can price that trade.

Rows: standalone kernel at the unmerged (s=196) and mid-merge (s=106)
Motionformer shapes, then whole-model baseline/merged. Writes
PROFILE_FRAME_S8.json.
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

from vtm.merge.policy import MergePolicy  # noqa: E402
from vtm.models.motionformer import Motionformer, MotionformerConfig  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def main():
    from bench import _probe_device

    _probe_device()
    rtt = host_roundtrip_latency()
    out = {"device": str(jax.devices()[0]), "rows": {}}
    rows = out["rows"]

    # --- standalone kernel at production shapes -------------------
    from vtm.ops.flash_attention import _frame_forward_tm, _frame_reference

    b, h, f, d = 8, 12, 8, 64
    rng = np.random.default_rng(0)
    for s in (196, 106):
        n = f * s
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        bias = jnp.asarray(np.log(rng.uniform(1, 12, (b, n))), jnp.float32)
        row = {}
        ref = None
        for variant in ("lane", "s8"):
            os.environ["VTM_FRAME_S8"] = "1" if variant == "s8" else "0"
            got = np.asarray(
                _frame_forward_tm(q, k, v, bias, 0.125, f, 784),
                np.float32,
            )
            if ref is None:
                ref = np.asarray(
                    _frame_reference(q, k, v, bias, 0.125, f), np.float32
                )
            err = float(
                np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
            )
            iters = 300
            secs = chained_seconds(
                lambda qq, kk: _frame_forward_tm(
                    qq, kk, v, bias, 0.125, f, 784
                ),
                q,
                iters,
                rtt=rtt,
                params=k,
            )
            row[variant] = {
                "ms": round(secs / iters * 1e3, 4),
                "rel_err": round(err, 6),
            }
        rows[f"kernel_s{s}"] = row
        print(f"kernel_s{s}", json.dumps(row), flush=True)

    # --- whole model ----------------------------------------------
    batch, iters = 8, 20
    x = jnp.asarray(
        rng.standard_normal((batch, 16, 224, 224, 3)), jnp.float32
    )
    config = MotionformerConfig(num_classes=400)
    base = Motionformer(
        config=config, policy=MergePolicy(rs=(0,) * 12, mode="none"),
        dtype=jnp.bfloat16,
    )
    merged = Motionformer(
        config=config,
        policy=MergePolicy(rs=(18,) * 12, mode="merge", prop_attn=True),
        dtype=jnp.bfloat16,
    )
    params = base.init(jax.random.key(0), x[:1])["params"]
    for variant in ("lane", "s8"):
        os.environ["VTM_FRAME_S8"] = "1" if variant == "s8" else "0"
        row = {}
        for name, model in [("baseline", base), ("merged", merged)]:
            try:
                secs = chained_seconds(
                    lambda p, v: model.apply({"params": p}, v), x, iters,
                    rtt=rtt, params=params,
                )
                row[name] = {
                    "ms_per_batch": round(secs / iters * 1e3, 3),
                    "clips_per_sec": round(batch * iters / secs, 2),
                }
            except Exception as e:
                row[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        rows[f"model_{variant}"] = row
        print(f"model_{variant}", json.dumps(row), flush=True)
    os.environ.pop("VTM_FRAME_S8", None)

    (REPO / "PROFILE_FRAME_S8.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
