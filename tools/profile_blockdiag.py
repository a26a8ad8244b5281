#!/usr/bin/env python3
"""A/B the block-diagonal per-frame attention kernel vs the einsum path
at TimeSformer spatial-attention shapes (B8, f8, ViT-B heads).

The einsum path is what every TimeSformer layer currently takes
(N=197 <= _FLASH_MIN_SEQ_BIASED): fp32 [bt, h, s, s] logits in HBM,
rank-1 masked bias. The kernel keeps logits in VMEM and writes
token-major output. Prints per-call ms for both paths over the merged
token schedule (s = 197 - 18*layer) and records tuning variants at the
full size.

Writes PROFILE_BLOCKDIAG.json. Run on the session TPU only (one JAX
process at a time); everything dispatched is fetched before exit.
"""

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

from vtm.models.common import attention_core  # noqa: E402
from vtm.ops.flash_attention import tome_blockdiag_attention  # noqa: E402
from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402


def main():
    b, f, h, d = 8, 8, 12, 64
    dtype = jnp.bfloat16
    iters = int(os.environ.get("VTM_PROFILE_ITERS", "50"))
    rtt = host_roundtrip_latency()
    results = {"device": str(jax.devices()[0]), "b": b, "f": f, "h": h, "d": d, "iters": iters}
    rng = np.random.default_rng(0)

    def mk(s):
        q = jnp.asarray(rng.standard_normal((b, h, f * s, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b, h, f * s, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, h, f * s, d)), dtype)
        kb = jnp.asarray(
            np.log(rng.uniform(1, 5, (b, f, s)) * (np.arange(s) > 0) + (np.arange(s) == 0)),
            jnp.float32,
        ).reshape(b, f * s)
        return q, k, v, kb

    def einsum_path(q, k, v, kb, s, biased):
        # fold to the (b t) batch the model uses; kb -> size_bias form
        qf = q.reshape(b, h, f, s, d).transpose(0, 2, 1, 3, 4).reshape(b * f, h, s, d)
        kf = k.reshape(b, h, f, s, d).transpose(0, 2, 1, 3, 4).reshape(b * f, h, s, d)
        vf = v.reshape(b, h, f, s, d).transpose(0, 2, 1, 3, 4).reshape(b * f, h, s, d)
        if not biased:
            return attention_core(qf, kf, vf, d**-0.5)
        sb = kb.reshape(b, f, s)[:, :, 1:].reshape(b * f, 1, 1, s - 1)
        return attention_core(qf, kf, vf, d**-0.5, sb, bias_excludes_first=True)

    sweep = [197, 179, 161, 125, 89, 53, 17]
    rows = {}
    for s in sweep:
        q, k, v, kb = mk(s)
        row = {}
        for biased in (True, False) if s == 197 else (True,):
            tag = "biased" if biased else "unbiased"
            secs = chained_seconds(
                lambda z, _s=s, _b=biased: einsum_path(z[0], z[1], z[2], z[3], _s, _b),
                (q, k, v, kb), iters, rtt=rtt,
            )
            row[f"einsum_{tag}_ms"] = round(secs / iters * 1e3, 4)
            secs = chained_seconds(
                lambda z, _b=biased: tome_blockdiag_attention(
                    z[0], z[1], z[2], z[3] if _b else None, d**-0.5, f, _b
                ),
                (q, k, v, kb), iters, rtt=rtt,
            )
            row[f"kernel_{tag}_ms"] = round(secs / iters * 1e3, 4)
        rows[s] = row
        print(f"s={s}: {row}", flush=True)

    # tuning variants at full size
    q, k, v, kb = mk(197)
    variants = {}
    for g, fcs in [(2, 2), (2, 4), (2, 8), (4, 2), (4, 4), (6, 2), (12, 2), (12, 1)]:
        os.environ["VTM_BLOCKDIAG_GROUP"] = str(g)
        os.environ["VTM_BLOCKDIAG_FCS"] = str(fcs)
        try:
            secs = chained_seconds(
                lambda z: tome_blockdiag_attention(z[0], z[1], z[2], z[3], d**-0.5, f, True),
                (q, k, v, kb), iters, rtt=rtt,
            )
            variants[f"g{g}_fcs{fcs}"] = round(secs / iters * 1e3, 4)
        except Exception as e:
            variants[f"g{g}_fcs{fcs}"] = f"{type(e).__name__}: {e}"
        print(f"g={g} fcs={fcs}: {variants[f'g{g}_fcs{fcs}']}", flush=True)
    os.environ.pop("VTM_BLOCKDIAG_GROUP", None)
    os.environ.pop("VTM_BLOCKDIAG_FCS", None)

    results["sweep"] = rows
    results["variants_s197_biased"] = variants
    (REPO / "PROFILE_BLOCKDIAG.json").write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
