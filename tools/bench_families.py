#!/usr/bin/env python3
"""Audited throughput sidecar for ALL FOUR ToMe backbones.

For each family at its paper config (experiments.sh "Roughly optimal
merging": VideoMAE r=150, ViViT r=300, TimeSformer r=18,
Motionformer r=18; batch 8, bf16) this measures baseline and merged
clips/s with the scan-chained DCE-safe timer, XLA-counted FLOPs for
both programs, the flop-ideal speedup, and MFU against an on-chip bf16
matmul peak probe. Writes BENCH_FAMILIES.json — the auditable artifact
behind the README/PARITY throughput table (VERDICT-r2 weak item 1).

Run: python tools/bench_families.py          (real TPU)
Env: VTM_BENCH_ITERS (20), VTM_BENCH_BATCH (8),
     VTM_FAMILIES=videomae,vivit,timesformer,motionformer
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
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def build(family: str, merged: bool):
    """(module, input_shape) at the family's paper config."""
    if family == "videomae":
        from vtm.models.videomae import VideoMAE, VideoMAEConfig

        policy = (
            MergePolicy(rs=(150,) * 12, mode="merge", prop_attn=False)
            if merged
            else MergePolicy(rs=(0,) * 12, mode="none")
        )
        return (
            VideoMAE(config=VideoMAEConfig(num_classes=400), policy=policy,
                     dtype=jnp.bfloat16),
            (16, 224, 224, 3),
        )
    if family == "vivit":
        from vtm.models.vivit import ViViT, ViViTConfig

        policy = (
            MergePolicy(rs=(300,) * 12, mode="merge", prop_attn=True,
                        class_token=True)
            if merged
            else MergePolicy(rs=(0,) * 12, mode="none", class_token=True)
        )
        return (
            ViViT(config=ViViTConfig(num_classes=400), policy=policy,
                  dtype=jnp.bfloat16),
            (32, 224, 224, 3),
        )
    if family == "timesformer":
        from vtm.models.timesformer import TimeSformer, TimeSformerConfig

        policy = (
            MergePolicy(rs=(18,) * 12, mode="merge", prop_attn=True)
            if merged
            else MergePolicy(rs=(0,) * 12, mode="none")
        )
        return (
            TimeSformer(config=TimeSformerConfig(num_classes=400),
                        policy=policy, dtype=jnp.bfloat16),
            (8, 224, 224, 3),
        )
    if family == "motionformer":
        from vtm.models.motionformer import Motionformer, MotionformerConfig

        policy = (
            MergePolicy(rs=(18,) * 12, mode="merge", prop_attn=True)
            if merged
            else MergePolicy(rs=(0,) * 12, mode="none")
        )
        return (
            Motionformer(
                config=MotionformerConfig(num_classes=400),
                policy=policy, dtype=jnp.bfloat16,
            ),
            (16, 224, 224, 3),
        )
    raise KeyError(family)


def main():
    # lease-health probe with recovery patience + the shared measurement
    # helpers — one implementation feeds BOTH artifacts (BENCH_DETAIL
    # and BENCH_FAMILIES), so a probe/FLOP-count fix cannot diverge
    sys.path.insert(0, str(REPO))
    from bench import (
        _probe_device,
        nominal_or_probe_peak,
        peak_matmul_tflops,
        program_flops,
    )

    _probe_device()
    iters = int(os.environ.get("VTM_BENCH_ITERS", "20"))
    batch = int(os.environ.get("VTM_BENCH_BATCH", "8"))
    families = os.environ.get(
        "VTM_FAMILIES", "videomae,vivit,timesformer,motionformer"
    ).split(",")
    rtt = host_roundtrip_latency()

    probe = peak_matmul_tflops(rtt)
    # nominal peak when the device kind is known — the probe drifts
    # +/-20% (observed above spec) and makes MFU incomparable across runs
    peak = nominal_or_probe_peak(str(jax.devices()[0]), probe)

    out = {"device": str(jax.devices()[0]), "batch": batch, "iters": iters,
           "peak_bf16_tflops_probe": round(probe, 1),
           "peak_bf16_tflops_mfu_denominator": round(peak, 1),
           "families": {}}
    # a subset run (VTM_FAMILIES=motionformer) must not clobber the
    # other families' rows — carry them over from the existing artifact,
    # marked as carried (cross-run drift on this chip is +/-10-20%, so a
    # mixed artifact must be auditable as mixed)
    prior = REPO / "BENCH_FAMILIES.json"
    if prior.exists():
        try:
            for name, row in json.loads(prior.read_text())["families"].items():
                out["families"][name] = dict(row, carried_from_prior_run=True)
        except Exception:
            pass
    rng = np.random.default_rng(0)
    for family in families:
        # one family's failure (e.g. a compile error) must not destroy
        # the whole artifact: record the error row, write what we have
        # so far, and keep going (a VMEM-OOM on family 4 once cost the
        # entire 35-minute run)
        try:
            base, shape = build(family, merged=False)
            x = jnp.asarray(
                rng.standard_normal((batch,) + shape), jnp.float32
            )
            params = base.init(jax.random.key(0), x[:1])["params"]

            def cps(module):
                secs = chained_seconds(
                    lambda p, v: module.apply({"params": p}, v)[0], x, iters,
                    rtt=rtt, params=params,
                )
                return batch * iters / secs

            base_cps = cps(base)
            merged_mod, _ = build(family, merged=True)
            merged_cps = cps(merged_mod)
            row = dict(
                baseline_clips_per_sec=round(base_cps, 2),
                merged_clips_per_sec=round(merged_cps, 2),
                speedup=round(merged_cps / base_cps, 4),
            )
            try:
                fb = program_flops(base, params, x)
                fm = program_flops(merged_mod, params, x)
                row.update(
                    flops_per_clip_baseline=fb / batch,
                    flops_per_clip_merged=fm / batch,
                    flop_ideal_speedup=round(fb / fm, 4),
                    pct_of_flop_ideal=round(
                        (merged_cps / base_cps) / (fb / fm) * 100, 1
                    ),
                    mfu_baseline=round(fb * base_cps / batch / 1e12 / peak, 4),
                    mfu_merged=round(fm * merged_cps / batch / 1e12 / peak, 4),
                )
            except Exception as e:
                row["flops_error"] = f"{type(e).__name__}: {e}"
        except Exception as e:
            row = {"error": f"{type(e).__name__}: {str(e)[:500]}"}
        out["families"][family] = row
        print(json.dumps({family: row}), flush=True)
        (REPO / "BENCH_FAMILIES.json").write_text(
            json.dumps(out, indent=1) + "\n"
        )


if __name__ == "__main__":
    main()
