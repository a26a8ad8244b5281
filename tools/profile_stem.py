#!/usr/bin/env python3
"""A/B the tubelet/patch embedding formulations on VideoMAE ViT-B
inputs (B8, 16x224x224x3, tubelet 2x16x16 -> 768).

Forms:
  conv2d   — production TubeletEmbed (frame-stacked channels + 2-D conv)
  im2row   — explicit space-to-depth reshape/transpose + one matmul
             [B*1568, 1536] @ [1536, 768]
  conv3d   — the naive 5-D conv (known-pathological baseline)

Writes PROFILE_STEM.json. All dispatched work is fetched before exit.
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

from vtm.utils.benchmark import chained_seconds, host_roundtrip_latency  # noqa: E402

B, T, H, W, C = 8, 16, 224, 224, 3
TT, P, D = 2, 16, 768


def conv2d_form(v, kernel, bias):
    b = v.shape[0]
    x = v.astype(jnp.bfloat16).reshape(b * (T // TT), TT, H, W, C)
    x = jnp.concatenate([x[:, i] for i in range(TT)], axis=-1)
    k2 = jnp.transpose(kernel.astype(jnp.bfloat16), (1, 2, 0, 3, 4)).reshape(
        P, P, TT * C, D
    )
    y = jax.lax.conv_general_dilated(
        x, k2, window_strides=(P, P), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + bias.astype(jnp.bfloat16)).reshape(b, -1, D)


def im2row_form(v, kernel, bias):
    b = v.shape[0]
    x = v.astype(jnp.bfloat16).reshape(b, T // TT, TT, H // P, P, W // P, P, C)
    # rows ordered (t, h, w) token-major; columns (tt, ph, pw, c) t-major
    # to match the conv kernel layout (t, p, p, c, D)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        b, (T // TT) * (H // P) * (W // P), TT * P * P * C
    )
    k = kernel.astype(jnp.bfloat16).reshape(TT * P * P * C, D)
    return x @ k + bias.astype(jnp.bfloat16)


def conv3d_form(v, kernel, bias):
    b = v.shape[0]
    y = jax.lax.conv_general_dilated(
        v.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        window_strides=(TT, P, P), padding="VALID",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    return (y + bias.astype(jnp.bfloat16)).reshape(b, -1, D)


def convsum_form(v, kernel, bias):
    """Sum of TT per-frame 2-D convs — no frames-into-channels concat
    pass (the conv2d form materialises a second 38 MB copy to fold t
    into the channel minor dim). Numerically = conv2d up to one extra
    bf16 add."""
    b = v.shape[0]
    x = v.astype(jnp.bfloat16).reshape(b * (T // TT), TT, H, W, C)
    k = kernel.astype(jnp.bfloat16)
    y = None
    for i in range(TT):
        yi = jax.lax.conv_general_dilated(
            x[:, i], k[i], window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = yi if y is None else y + yi
    return (y + bias.astype(jnp.bfloat16)).reshape(b, -1, D)


def roofline_form(xrows, krows, bias):
    """Pure [B*N, TT*P*P*C] @ [TT*P*P*C, D] matmul on pre-laid-out
    operands — the stem's MXU floor with zero layout work."""
    return xrows @ krows + bias.astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((TT, P, P, C, D)) * 0.02, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((D,)) * 0.02, jnp.float32)

    # numerical agreement first
    y0 = np.asarray(conv2d_form(v, kernel, bias), np.float32)
    y1 = np.asarray(im2row_form(v, kernel, bias), np.float32)
    y2 = np.asarray(convsum_form(v, kernel, bias), np.float32)
    err = np.abs(y0 - y1).max()
    err_cs = np.abs(y0 - y2).max()
    print(f"conv2d vs im2row maxerr {err:.2e} (bf16 accum noise expected)", flush=True)
    print(f"conv2d vs convsum maxerr {err_cs:.2e}", flush=True)

    # roofline operands laid out once, outside the timer
    xrows = np.asarray(
        jnp.transpose(
            jnp.asarray(v, jnp.bfloat16).reshape(
                B, T // TT, TT, H // P, P, W // P, P, C
            ),
            (0, 1, 3, 5, 2, 4, 6, 7),
        ).reshape(B * (T // TT) * (H // P) * (W // P), TT * P * P * C)
    )
    xrows = jnp.asarray(xrows)
    krows = jnp.asarray(kernel, jnp.bfloat16).reshape(TT * P * P * C, D)

    rtt = host_roundtrip_latency()
    iters = 50
    out = {
        "device": str(jax.devices()[0]),
        "iters": iters,
        "maxerr_conv2d_vs_im2row": float(err),
        "maxerr_conv2d_vs_convsum": float(err_cs),
    }
    for name, fn in [
        ("conv2d", conv2d_form),
        ("convsum", convsum_form),
        ("im2row", im2row_form),
        ("conv3d", conv3d_form),
    ]:
        secs = chained_seconds(lambda z, _f=fn: _f(z, kernel, bias), v, iters, rtt=rtt)
        out[name + "_ms"] = round(secs / iters * 1e3, 4)
        print(name, out[name + "_ms"], flush=True)
    secs = chained_seconds(
        lambda z: roofline_form(z, krows, bias), xrows, iters, rtt=rtt
    )
    out["roofline_matmul_ms"] = round(secs / iters * 1e3, 4)
    print("roofline_matmul", out["roofline_matmul_ms"], flush=True)

    (REPO / "PROFILE_STEM.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
