#!/usr/bin/env python3
"""Sub-step decomposition of merge_wavg (the 2.2 ms merge-apply budget).

PROFILE_MACHINERY.json splits the merged-VideoMAE machinery budget into
matcher 0.8 ms / merge-apply 2.2 ms. This tool decomposes the apply
step in-model by swapping ``bipartite.merge_wavg`` for variants with
individual sub-steps removed (timing-only, numerics garbage) or
replaced by candidate implementations (numerics-exact):

  prod       production merge_wavg
  noslice    even/odd strided slices -> contiguous prefix slices
  nogather   the [B, ta] perm row-gather -> identity (slices kept)
  nodst      dst path (sel mass + one-hot contraction + div) skipped
  nodiv      the wavg divide skipped (matmuls kept)
  noconcat   final [unm | dst] concat -> pad of the unm half
  gmm        CANDIDATE: perm gather as a [ta, ta] one-hot MXU matmul
             (0/1 rows; bf16 products exact -> bitwise-equal output)
  gmm_fold   CANDIDATE: one-hot over the FULL token axis (2*perm) so
             the even-slice disappears into the contraction
  take_fold  CANDIDATE: take_along_axis over the FULL token axis
             (2*perm) — no materialized even slice; the odd slice
             fuses into its elementwise consumers
  wmat       CANDIDATE: the whole apply as ONE [n_out, n] weight-matrix
             matmul (unm rows one-hot, dst rows size-normalized
             weights) — no slices/gather/concat/dst chain. Division
             moves first (per-edge weight = s/dst_size), so numerics
             are mathematically equal but not bitwise vs prod.

All variants run interleaved in one process, two passes, per-variant
minimum. Candidates are checked for numerical agreement with prod on
the first forward. Writes PROFILE_MERGE_APPLY.json.
Run: python tools/ab_merge_apply.py   (real TPU, ~15 min cold)
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
from vtm.merge.bipartite import _gather  # noqa: E402
from vtm.merge.policy import MergePolicy  # noqa: E402
from vtm.models.videomae import VideoMAE, VideoMAEConfig  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def _make_wavg(gather_mode="take", strided_slices=True, dst_path=True,
               do_div=True, do_concat=True):
    """Production merge_wavg with removable/replaceable sub-steps."""

    def wavg(m, x, size=None, threshold=None):
        assert threshold is None
        if size is None:
            size = jnp.ones(x.shape[:2] + (1,), jnp.float32)
        size = size.astype(jnp.float32)
        if m is None:
            return x, size
        n = x.shape[1]
        tb = n // 2
        ta = n - tb
        if strided_slices:
            src_x, dst_x = x[:, ::2, :], x[:, 1::2, :]
            src_s, dst_s = size[:, ::2, :], size[:, 1::2, :]
        else:  # timing-only: contiguous prefix slices
            src_x, dst_x = x[:, :ta, :], x[:, :tb, :]
            src_s, dst_s = size[:, :ta, :], size[:, :tb, :]

        perm = jnp.concatenate([m.unm_idx, m.src_idx], axis=1)  # [B, ta]
        if gather_mode == "take_fold":
            # even row i of the split is row 2i of the full tensor — no
            # materialized even slice; the odd slice fuses downstream
            gs = _gather(size, 2 * perm)
            gx = _gather(x, 2 * perm)
        else:
            gs = _gather(src_s, perm)  # [B, ta, 1] — negligible either way
        if gather_mode in ("take", "take_fold"):
            if gather_mode == "take":
                gx = _gather(src_x, perm)
        elif gather_mode == "none":  # timing-only
            gx = src_x
        elif gather_mode == "mm":
            iota = jnp.arange(ta, dtype=perm.dtype)
            oh = (perm[:, :, None] == iota[None, None, :]).astype(x.dtype)
            gx = jax.lax.dot_general(
                oh, src_x, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=x.dtype,
            )
        elif gather_mode == "mm_fold":
            # index the FULL token axis: even row i of the split is row
            # 2i of x — the even-slice pass folds into the contraction
            iota = jnp.arange(n, dtype=perm.dtype)
            oh = (2 * perm[:, :, None] == iota[None, None, :]).astype(x.dtype)
            gx = jax.lax.dot_general(
                oh, x, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=x.dtype,
            )
        else:
            raise ValueError(gather_mode)
        n_unm = m.unm_idx.shape[1]
        unm_x, sel_x = gx[:, :n_unm], gx[:, n_unm:]
        unm_s, sel_s = gs[:, :n_unm], gs[:, n_unm:]

        if dst_path:
            sel_mass = sel_x * sel_s.astype(x.dtype)
            oh_f = (
                m.dst_idx[:, :, None]
                == jnp.arange(tb, dtype=m.dst_idx.dtype)[None, None, :]
            ).astype(jnp.float32)
            args = (((1,), (1,)), ((0,), (0,)))
            add_mass = jax.lax.dot_general(
                oh_f.astype(x.dtype), sel_mass, args,
                preferred_element_type=x.dtype,
            )
            add_size = jax.lax.dot_general(
                oh_f, sel_s, args, preferred_element_type=jnp.float32
            )
            dst_size = dst_s + add_size
            dst_out = dst_x * dst_s.astype(x.dtype) + add_mass
            if do_div:
                dst_out = dst_out / dst_size.astype(x.dtype)
        else:  # timing-only
            dst_out, dst_size = dst_x, dst_s

        if do_concat:
            xm = jnp.concatenate([unm_x, dst_out], axis=1)
            sm = jnp.concatenate([unm_s, dst_size], axis=1)
        else:  # timing-only: shape-preserving pad instead
            xm = jnp.pad(unm_x, ((0, 0), (0, tb), (0, 0)))
            sm = jnp.pad(unm_s, ((0, 0), (0, tb), (0, 0)))
        return xm, sm

    return wavg


def _wmat_wavg(m, x, size=None, threshold=None):
    """The whole apply as one [n_out, n] weight-matrix matmul.

    Row i of W is the mixing weights of output token i over the input
    tokens: unm rows are one-hot (col 2*unm_idx), dst row j carries
    dst_s[j]/dst_size[j] on its own odd column and sel_s[k]/dst_size[j]
    on col 2*src_idx[k] for every merged src k with dst_idx[k]==j.
    Division happens while BUILDING W (per-edge weights), so xm = W @ x
    needs no slices, gathers, dst chain, divide, or concat.
    """
    assert threshold is None
    if size is None:
        size = jnp.ones(x.shape[:2] + (1,), jnp.float32)
    size = size.astype(jnp.float32)
    if m is None:
        return x, size
    n = x.shape[1]
    tb = n // 2
    idt = m.unm_idx.dtype
    iota_n = jnp.arange(n, dtype=idt)

    dst_s = size[:, 1::2, :]  # [B, tb, 1]
    sel_s = _gather(size, 2 * m.src_idx)  # [B, r, 1]
    unm_s = _gather(size, 2 * m.unm_idx)  # [B, n_unm, 1]
    oh_d = (
        m.dst_idx[:, :, None] == jnp.arange(tb, dtype=idt)[None, None, :]
    ).astype(jnp.float32)  # [B, r, tb]
    args = (((1,), (1,)), ((0,), (0,)))
    add_size = jax.lax.dot_general(
        oh_d, sel_s, args, preferred_element_type=jnp.float32
    )  # [B, tb, 1]
    dst_size = dst_s + add_size
    sm = jnp.concatenate([unm_s, dst_size], axis=1)

    # unm rows: plain one-hot over the full token axis
    w_unm = (2 * m.unm_idx[:, :, None] == iota_n[None, None, :]).astype(
        jnp.float32
    )  # [B, n_unm, n]
    # dst rows: own odd column, weighted
    odd = jnp.arange(tb, dtype=idt) * 2 + 1
    w_dst = (odd[None, :, None] == iota_n[None, None, :]).astype(
        jnp.float32
    ) * (dst_s / dst_size)  # [B, tb, n]
    # merged-src contributions: [B,tb,r] @ [B,r,n] one-hot contraction
    w_sel = sel_s / _gather(dst_size, m.dst_idx)  # [B, r, 1]
    e = (2 * m.src_idx[:, :, None] == iota_n[None, None, :]).astype(
        jnp.float32
    ) * w_sel  # [B, r, n]
    w_merge = jax.lax.dot_general(
        oh_d, e, args, preferred_element_type=jnp.float32
    )  # [B, tb, n]
    w = jnp.concatenate([w_unm, w_dst + w_merge], axis=1).astype(x.dtype)
    xm = jax.lax.dot_general(
        w, x, (((2,), (1,)), ((0,), (0,))), preferred_element_type=x.dtype
    )
    return xm, sm


VARIANTS = {
    "prod": None,
    "noslice": _make_wavg(strided_slices=False),
    "nogather": _make_wavg(gather_mode="none"),
    "nodst": _make_wavg(dst_path=False),
    "nodiv": _make_wavg(do_div=False),
    "noconcat": _make_wavg(do_concat=False),
    "gmm": _make_wavg(gather_mode="mm"),
    "gmm_fold": _make_wavg(gather_mode="mm_fold"),
    "take_fold": _make_wavg(gather_mode="take_fold"),
    "wmat": _wmat_wavg,
}
EXACT = ("gmm", "gmm_fold", "take_fold")  # numerics must match prod
# numerics checked but only to a tolerance (division-first reassociation)
APPROX = ("wmat",)


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
    video = jnp.asarray(rng.standard_normal((batch, 16, 224, 224, 3)), jnp.float32)
    params = model.init(jax.random.key(0), video[:1])["params"]
    rtt = host_roundtrip_latency()

    fns = {}
    for name, wavg in VARIANTS.items():
        def make(wavg):
            def fwd(p, v):
                saved = bipartite.merge_wavg
                try:
                    if wavg is not None:
                        bipartite.merge_wavg = wavg
                    return model.apply({"params": p}, v)[0]
                finally:
                    bipartite.merge_wavg = saved
            return fwd

        fns[name] = make(wavg)

    ref = np.asarray(jax.jit(fns["prod"])(params, video))
    checks = {}
    for name in EXACT + APPROX:
        out = np.asarray(jax.jit(fns[name])(params, video))
        err = float(np.max(np.abs(out - ref)))
        checks[name] = err
        print(json.dumps({"exactness": name, "max_abs_err": err}), flush=True)

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
            strided_slices=round(ms["prod"] - ms["noslice"], 3),
            perm_gather=round(ms["prod"] - ms["nogather"], 3),
            dst_path=round(ms["prod"] - ms["nodst"], 3),
            divide=round(ms["prod"] - ms["nodiv"], 3),
            concat=round(ms["prod"] - ms["noconcat"], 3),
        ),
        candidate_ms={k: ms[k] for k in EXACT + APPROX},
        exactness_max_abs_err=checks,
        note=(
            "no* variants are timing-only (numerics wrong); splits "
            "overlap and need not sum to the merge-apply total"
        ),
    )
    (REPO / "PROFILE_MERGE_APPLY.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
