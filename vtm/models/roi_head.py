"""ROI-align detection head for the AVA path.

The reference fork STRIPPED `ResNetRoIHead` from head_helper.py (its
detectron2 ROIAlign dependency was removed), so its own
`DETECTION.ENABLE=True` path crashes with AttributeError — this module
goes beyond the fork by restoring the upstream PySlowFast semantics
(facebookresearch/SlowFast head_helper.ResNetRoIHead): per-pathway
temporal average pooling, ROIAlign (aligned=True halves-pixel offset,
bilinear, fixed sample grid), spatial max-pool, pathway concat,
dropout + linear projection, sigmoid at eval.

TPU-first: boxes per batch are padded to a static count; ROI sampling
is a vectorised bilinear gather (4 corner gathers), not a scalar loop.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def roi_align(
    feat: jax.Array,  # [B, H, W, C]
    boxes: jax.Array,  # [N, 5]: (batch_idx, x1, y1, x2, y2) in input pixels
    resolution: int,
    spatial_scale: float,
    aligned: bool = True,
    samples_per_bin: int = 2,
) -> jax.Array:
    """[N, resolution, resolution, C] bilinear ROI features."""
    b_idx = boxes[:, 0].astype(jnp.int32)
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 1] * spatial_scale - offset
    y1 = boxes[:, 2] * spatial_scale - offset
    x2 = boxes[:, 3] * spatial_scale - offset
    y2 = boxes[:, 4] * spatial_scale - offset
    if not aligned:
        x2 = jnp.maximum(x2, x1 + 1.0)
        y2 = jnp.maximum(y2, y1 + 1.0)

    n = boxes.shape[0]
    g = resolution * samples_per_bin
    # sample grid: g x g points, samples averaged per bin
    steps = (jnp.arange(g) + 0.5) / g  # [g]
    ys = y1[:, None] + steps[None, :] * (y2 - y1)[:, None]  # [N, g]
    xs = x1[:, None] + steps[None, :] * (x2 - x1)[:, None]

    h, w = feat.shape[1:3]
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    wy = jnp.clip(ys - y0, 0.0, 1.0)  # [N, g]
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def gather(yi, xi):
        # fold the batch index into ONE gather -> [N, g, g, C]; a
        # feat[b_idx] pre-copy would materialise an [N, H, W, C]
        # intermediate (~hundreds of MB at padded box counts)
        return feat[b_idx[:, None, None], yi[:, :, None], xi[:, None, :]]

    f00 = gather(y0, x0)
    f01 = gather(y0, x1i)
    f10 = gather(y1i, x0)
    f11 = gather(y1i, x1i)
    wy_ = wy[:, :, None, None]
    wx_ = wx[:, None, :, None]
    out = (
        f00 * (1 - wy_) * (1 - wx_)
        + f01 * (1 - wy_) * wx_
        + f10 * wy_ * (1 - wx_)
        + f11 * wy_ * wx_
    )
    # average the samples inside each bin
    out = out.reshape(
        n, resolution, samples_per_bin, resolution, samples_per_bin, -1
    ).mean(axis=(2, 4))
    return out


class ResNetRoIHead(nn.Module):
    """Upstream-SlowFast ROI head semantics (see module docstring)."""

    num_classes: int
    resolution: Tuple[int, ...]  # per pathway
    scale_factor: Tuple[int, ...]  # per pathway (input px per feature px)
    dropout_rate: float = 0.0
    act_func: str = "sigmoid"
    aligned: bool = True
    detach_final_fc: bool = False
    fc_init_std: float = 0.01

    @nn.compact
    def __call__(self, pathways: Sequence[jax.Array], boxes: jax.Array,
                 train: bool = False):
        feats = []
        for p, x in enumerate(pathways):
            # [B, T, H, W, C] -> temporal average -> [B, H, W, C]
            x = x.mean(axis=1)
            roi = roi_align(
                x, boxes, int(self.resolution[p]),
                1.0 / float(self.scale_factor[p]), aligned=self.aligned,
            )
            feats.append(roi.max(axis=(1, 2)))  # spatial max-pool
        x = jnp.concatenate(feats, axis=-1)  # [N, sum(C)]
        if train and self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        if self.detach_final_fc:
            x = jax.lax.stop_gradient(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(self.fc_init_std),
            dtype=jnp.float32,
            name="projection",
        )(x)
        if not train:
            if self.act_func == "sigmoid":
                x = jax.nn.sigmoid(x)
            elif self.act_func == "softmax":
                x = jax.nn.softmax(x, axis=-1)
        return x
