#!/usr/bin/env python3
"""Per-stage time breakdown of Motionformer trajectory attention on TPU.

Motionformer sits at ~21% MFU (BENCH_FAMILIES.json) — half of every
other family — while its merged/baseline ratio is already at FLOP-ideal,
i.e. the trajectory-attention *implementation* is slow in both programs.
This tool times each stage of `vtm/models/motionformer.py:TrajectoryAttention`
standalone at baseline ViT-B/224 shapes (B=8, N=1569, f=8) with the
scan-chained DCE-safe timer, plus the whole block and whole model for a
sum-of-parts cross-check, and prints analytic per-stage MFU.

Stages:
  qkv              x @ W_qkv                             [B,N,D]->[B,N,3D]
  spatial_pallas   tome_frame_attention -> xfa           [B,N',F,h,hd]
  spatial_xla      the einsum fallback path (for comparison)
  epilogue_transpose / diag_gather / diag_slice          layout micro-ops
  proj_kv_half     xq @ W_k (the f-expanded half-KV matmul)
  temporal_einsum  logits2/softmax/out in token-major layout (model code)
  temporal_hmat    head-indicator-matmul alternative (stays in [B,N,F,D])
  cls_attn / proj_mlp

CAVEAT: stages ending in pure layout ops (transpose/gather) are
unreliable — the timer's `.sum()` accumulator lets XLA simplify
sum(transpose(x)) to sum(x). Trust matmul/softmax-terminated stages
and the whole_attn/whole_block/whole_model rows.

Run: python tools/profile_motionformer.py   (real TPU, ~4 min warm)
Writes PROFILE_MOTIONFORMER.json.
"""

from __future__ import annotations

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

from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def main():
    from bench import _probe_device, nominal_or_probe_peak

    _probe_device()

    b, f, s = 8, 8, 196
    n = f * s + 1  # 1569
    d, h = 768, 12
    hd = d // h
    scale = hd ** -0.5
    iters = 20
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=dt):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, dtype)

    rtt = host_roundtrip_latency()
    m = jnp.ones((4096, 4096), jnp.bfloat16)
    peak = 2 * 4096 ** 3 * 50 / chained_seconds(lambda v: v @ v, m, 50, rtt=rtt) / 1e12
    peak = nominal_or_probe_peak(str(jax.devices()[0]), peak)

    results = {}

    def timeit(name, fn, x, flops=None, params=None, reps=None):
        it = reps or iters
        sec = chained_seconds(fn, x, it, rtt=rtt, params=params)
        ms = sec / it * 1e3
        row = {"ms": round(ms, 4)}
        if flops:
            row["eff_tflops"] = round(flops / (sec / it) / 1e12, 1)
            row["mfu"] = round(flops / (sec / it) / 1e12 / peak, 4)
        results[name] = row
        print(json.dumps({name: row}), flush=True)
        return ms

    # --- stage inputs ---
    x = arr(b, n, d)
    w_qkv = arr(d, 3 * d)
    q_ = arr(b, h, n - 1, hd)
    k_ = arr(b, h, n - 1, hd)
    v_ = arr(b, h, n - 1, hd)
    xfa = arr(b, h, n - 1, f, hd)
    xq = arr(b, n - 1, f, d)
    w_d = arr(d, d)
    k2 = arr(b, h, n - 1, f, hd)
    q2 = arr(b, h, n - 1, hd)

    # qkv projection
    timeit("qkv", lambda p, v2: v2 @ p, x, flops=2 * b * n * d * 3 * d, params=w_qkv, reps=200)

    # spatial per-frame attention — pallas kernel vs einsum path
    from vtm.ops.flash_attention import tome_frame_attention

    sp_flops = 2 * 2 * b * h * (n - 1) * (n - 1) * hd

    def spatial_pallas(p, qq):
        return tome_frame_attention(qq, p[0], p[1], None, scale, f)

    timeit("spatial_pallas", spatial_pallas, q_, flops=sp_flops, params=(k_, v_), reps=50)

    def spatial_xla(p, qq):
        kk, vv = p
        logits = jnp.einsum("bhqd,bhkd->bhqk", qq, kk, preferred_element_type=jnp.float32) * scale
        logits = logits.reshape(b, h, n - 1, f, s)
        attn = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
        v_f = vv.reshape(b, h, f, s, hd)
        return jnp.einsum("bhqfn,bhfnd->bhqfd", attn, v_f)

    timeit("spatial_xla", spatial_xla, q_, flops=sp_flops, params=(k_, v_))

    # kernel epilogue-transpose cost estimate ([bh,f,nq,d] -> [b,n,f,h,d])
    raw = arr(b * h, f, n - 1, hd)
    timeit(
        "epilogue_transpose",
        lambda t: jnp.transpose(t.reshape(b, h, f, n - 1, hd), (0, 3, 2, 1, 4)),
        raw, reps=200,
    )

    # diagonal extraction: gather vs static-slice diagonal
    frame_of = jnp.arange(n - 1) // s

    def diag_gather(t):
        return jnp.take_along_axis(t, frame_of[None, :, None, None], axis=2)[:, :, 0, :]

    timeit("diag_gather", diag_gather, xq, reps=200)

    def diag_slice(t):
        t5 = t.reshape(b, f, s, f, d)
        return jnp.diagonal(t5, axis1=1, axis2=3).transpose(0, 3, 1, 2).reshape(b, n - 1, d)

    timeit("diag_slice", diag_slice, xq, reps=200)

    # the f-expanded half-KV projection
    timeit(
        "proj_kv_half",
        lambda p, t: t @ p,
        xq,
        flops=2 * b * (n - 1) * f * d * d,
        params=w_d, reps=200,
    )

    # temporal attention, token-major einsum form (current model code)
    xfa_nf = arr(b, n - 1, f, h, hd)
    q2n = arr(b, n - 1, h, hd)

    def temporal_einsum(p, t):
        logits2 = jnp.einsum("bnhd,bnfhd->bnhf", p, t, preferred_element_type=jnp.float32)
        attn2 = jax.nn.softmax(logits2, axis=-1).astype(dt)
        return jnp.einsum("bnhf,bnfhd->bnhd", attn2, t)

    timeit("temporal_einsum", temporal_einsum, xfa_nf, params=q2n, reps=200)

    # temporal attention, head-indicator-matmul form: stays in [b,n,f,d]
    hmat = jnp.zeros((d, h), dt).at[jnp.arange(d), jnp.arange(d) // hd].set(1.0)

    def temporal_hmat(p, t):
        q2d, hm = p
        z = q2d[:, :, None, :] * t.reshape(b, n - 1, f, d)
        logits2 = jnp.einsum("bnfd,dh->bnfh", z, hm, preferred_element_type=jnp.float32)
        attn2 = jax.nn.softmax(logits2, axis=2)
        attn2_d = jnp.einsum("bnfh,dh->bnfd", attn2.astype(dt), hm)
        return jnp.sum(attn2_d * t.reshape(b, n - 1, f, d), axis=2)

    timeit("temporal_hmat", temporal_hmat, xfa_nf, params=(arr(b, n - 1, d), hmat), reps=200)

    # cls row: full-sequence single-query attention
    qc = arr(b, h, 1, hd)
    kf_ = arr(b, h, n, hd)
    vf_ = arr(b, h, n, hd)

    def cls_attn(p, t):
        kk, vv = p
        lg = jnp.einsum("bhqd,bhkd->bhqk", t, kk, preferred_element_type=jnp.float32)
        at = jax.nn.softmax(lg, axis=-1).astype(dt)
        return jnp.einsum("bhqk,bhkd->bhqd", at, vv)

    timeit("cls_attn", cls_attn, qc, params=(kf_, vf_), reps=200)

    # output proj + MLP
    w_fc1, w_fc2 = arr(d, 4 * d), arr(4 * d, d)

    def proj_mlp(p, t):
        t = t @ p[0]
        hmid = jax.nn.gelu(t @ p[1])
        return hmid @ p[2]

    timeit("proj_mlp", proj_mlp, x, flops=2 * b * n * d * d * 9, params=(w_d, w_fc1, w_fc2), reps=200)

    # whole attention module, whole block, whole model
    from vtm.merge.policy import MergePolicy, MergeState
    from vtm.models.motionformer import (
        Motionformer, MotionformerBlock, MotionformerConfig, TrajectoryAttention,
    )

    config = MotionformerConfig()
    attn = TrajectoryAttention(config, dtype=dt)
    ap = attn.init(jax.random.key(0), x[:1], f, None, True)["params"]
    timeit(
        "whole_attn",
        lambda p, t: attn.apply({"params": p}, t, f, None, True)[0],
        x, params=ap,
    )

    blk = MotionformerBlock(config, MergePolicy(rs=(0,) * 12, mode="none"), dtype=dt)
    bp = blk.init(jax.random.key(0), x[:1], MergeState(), 0, f)["params"]
    timeit(
        "whole_block",
        lambda p, t: blk.apply({"params": p}, t, MergeState(), 0, f)[0],
        x, params=bp,
    )

    video = jnp.asarray(rng.standard_normal((b, 16, 224, 224, 3)), jnp.float32)
    model = Motionformer(config=config, policy=MergePolicy(rs=(0,) * 12, mode="none"), dtype=dt)
    mp = model.init(jax.random.key(0), video[:1])["params"]
    timeit(
        "whole_model",
        lambda p, t: model.apply({"params": p}, t)[0],
        video, params=mp,
    )

    out = dict(
        device=str(jax.devices()[0]),
        batch=b, n=n, frames=f,
        peak_bf16_tflops=round(peak, 1),
        stages=results,
        note="whole_block should ~= qkv+spatial+xq_tr+proj_kv+temporal+proj_mlp; "
             "whole_model/12 vs whole_block shows inter-layer effects",
    )
    (REPO / "PROFILE_MOTIONFORMER.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "stages"}))


if __name__ == "__main__":
    main()
