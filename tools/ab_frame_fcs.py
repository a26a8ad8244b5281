#!/usr/bin/env python3
"""In-model A/B of VTM_FRAME_TM_FCS for the token-major per-frame
attention kernel: whole-model Motionformer ViT-B/224 (baseline r=0 and
merged r=18) at each frame-chunk setting, one process, same weights.

The standalone-kernel sweep (PROFILE_FRAME_TM.json) has fcs=4 ~10%
faster than the production fcs=2 — but fcs was chunked down to 2 in the
first place because the kernel's scoped VMEM is shared with XLA's
overlapped copies *inside the merged program* (flash_attention.py:
_frame_forward_tm docstring), so only a whole-model A/B can decide the
default. Writes PROFILE_FRAME_FCS_AB.json.
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
    batch, iters = 8, 20
    rng = np.random.default_rng(0)
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
    rtt = host_roundtrip_latency()

    out = {"device": str(jax.devices()[0]), "batch": batch, "iters": iters}
    rows = {}
    for fcs in ["default", "4"]:
        if fcs == "default":
            os.environ.pop("VTM_FRAME_TM_FCS", None)
        else:
            os.environ["VTM_FRAME_TM_FCS"] = fcs
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
        rows[f"fcs_{fcs}"] = row
        print(f"fcs_{fcs}", json.dumps(row), flush=True)
    os.environ.pop("VTM_FRAME_TM_FCS", None)

    out["rows"] = rows
    (REPO / "PROFILE_FRAME_FCS_AB.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
