"""Masked-feature pretraining (MaskFeat) for MViT — the reference's
MaskMViT, TPU-native.

Functional parity targets:
  slowfast/models/masked.py (MaskMViT:24-658 — the MaskFeat path:
  _maskfeat_forward:550-645, _get_multiscale_mask:172-184,
  _get_hog_label_3d:263-295)
  slowfast/models/operators.py (HOGLayerC:66-120)
  slowfast/models/head_helper.py (MSSeparateHead:449-560)
  slowfast/models/utils.py (calc_mvit_feature_geometry:200-225)

TPU-first: the reference selects masked rows with boolean indexing
(``x[mask]`` — dynamic shapes); here the head predicts ALL positions
with static shapes and the mask enters the LOSS as per-position
weights (vtm/train/losses.py::multiple_mse — mathematically the same
masked-mean objective). HOG labels are pure-numpy host-side work (no
gradients flow through them).

The MAE branch (MASK.MAE_ON) is not carried: its pooling-attention
encoder over a token SUBSET contradicts MViT's grid pooling and the
reference itself only exercises MaskFeat configs (SURVEY §8).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vtm.models.common import LayerNorm
from vtm.models.mvit import (
    MultiScaleBlock,
    MViTSpec,
    get_3d_sincos_pos_embed,
    mvit_spec_from_cfg,
    trunc02,
)


# ------------------------------------------------------------------- HOG


def hog_features(images: np.ndarray, nbins: int = 9, pool: int = 8) -> np.ndarray:
    """Per-channel histogram-of-gradients features.

    Parity with slowfast/models/operators.py HOGLayerC:66-120:
    reflect-padded Sobel gradients, orientation bins via
    ``floor(atan2(gx, gy) / pi * nbins) % nbins`` weighted by gradient
    magnitude, summed over pool x pool cells, then L2-normalised over
    the bins axis. images: [B, H, W, 3] float -> [B, 3, nbins, H/pool,
    W/pool].
    """
    b, h, w, c = images.shape
    x = np.pad(
        images, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect"
    ).astype(np.float32)
    kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
    ky = kx.T
    # conv2d (cross-correlation) per channel
    gx = np.zeros((b, h, w, c), np.float32)
    gy = np.zeros((b, h, w, c), np.float32)
    for i in range(3):
        for j in range(3):
            patch = x[:, i : i + h, j : j + w, :]
            gx += kx[i, j] * patch
            gy += ky[i, j] * patch
    norm = np.sqrt(gx ** 2 + gy ** 2)
    phase = np.arctan2(gx, gy) / np.pi * nbins  # [-nbins, nbins]
    binned = np.floor(phase).astype(np.int64) % nbins

    hp, wp = h // pool, w // pool
    out = np.zeros((b, c, nbins, h, w), np.float32)
    bi = np.arange(b)[:, None, None, None]
    ci = np.arange(c)[None, None, None, :]
    hi = np.arange(h)[None, :, None, None]
    wi = np.arange(w)[None, None, :, None]
    np.add.at(
        out,
        (bi, ci, np.transpose(binned, (0, 1, 2, 3)), hi, wi),
        np.transpose(norm, (0, 1, 2, 3)),
    )
    # sum over pool x pool cells (unfold + sum)
    out = out[:, :, :, : hp * pool, : wp * pool]
    out = out.reshape(b, c, nbins, hp, pool, wp, pool).sum(axis=(4, 6))
    # l2 normalize over bins
    denom = np.sqrt((out ** 2).sum(axis=2, keepdims=True))
    return out / np.maximum(denom, 1e-12)


def calc_mvit_feature_geometry(spec: MViTSpec):
    """Per-depth (feat_size, feat_stride) — reference utils.py:200-225."""
    feat_size = [
        [
            spec.num_frames // spec.patch_stride[0],
            spec.crop_size // spec.patch_stride[1],
            spec.crop_size // spec.patch_stride[2],
        ]
        for _ in range(spec.depth)
    ]
    feat_stride = [list(spec.patch_stride) for _ in range(spec.depth)]
    for entry in spec.pool_q_stride:
        for i in range(spec.depth):
            if i >= entry[0]:
                for j in range(3):
                    feat_size[i][j] = feat_size[i][j] // entry[j + 1]
                    feat_stride[i][j] = feat_stride[i][j] * entry[j + 1]
    return feat_size, feat_stride


def maskfeat_hog_labels(spec: MViTSpec, pretrain_depth, frames: np.ndarray,
                        cell: int = 8, nbins: int = 9):
    """Full-grid HOG targets (reference _get_hog_label_3d:263-295, but
    WITHOUT the masked-row selection — the mask weights the loss).

    frames: [B, T, H, W, C] raw video -> per-depth [B, N_d, C_hog].
    """
    feat_size, _ = calc_mvit_feature_geometry(spec)
    sub = frames[:, :: spec.patch_stride[0]]  # temporal patch stride
    b, t = sub.shape[:2]
    flat = sub.reshape((-1,) + sub.shape[2:])  # [BT, H, W, C]
    hog = hog_features(flat, nbins=nbins, pool=cell)  # [BT, 3, nbins, h, w]
    hog = hog.reshape(b * t, 3 * nbins, hog.shape[-2], hog.shape[-1])
    labels = []
    for depth in pretrain_depth:
        fs = feat_size[depth][-1]
        unfold = hog.shape[-1] // fs
        lab = hog.transpose(0, 2, 3, 1)  # BT h w C
        lab = lab.reshape(b * t, fs, unfold, fs, unfold, hog.shape[1])
        lab = lab.transpose(0, 1, 3, 5, 2, 4).reshape(
            b, t, fs, fs, -1
        )  # matches torch unfold(1,..).unfold(2,..).flatten(3) order
        labels.append(lab.reshape(b, t * fs * fs, -1))
    return labels


# ------------------------------------------------------------------ head


class MSSeparateHead(nn.Module):
    """Per-depth decoder (optional MultiScaleBlock stack) + LayerNorm +
    linear projection (reference head_helper.py:449-560). Predicts ALL
    positions; masking happens in the loss."""

    spec: MViTSpec
    pretrain_depth: Tuple[int, ...]
    num_classes: Tuple[int, ...]
    head_dims: Tuple[int, ...]
    feat_sizes: Tuple[Tuple[int, int, int], ...]
    decoder_depth: int = 0
    decoder_embed_dim: int = 512
    dec_kv_kernel: Tuple[int, ...] = ()
    dec_kv_stride: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, block_outputs, thw):
        s = self.spec
        outputs = []
        for idx, x in enumerate(block_outputs):
            head_dim = self.head_dims[idx]
            if self.decoder_depth > 0:
                for d in range(self.decoder_depth):
                    x, thw = MultiScaleBlock(
                        dim=head_dim,
                        dim_out=self.decoder_embed_dim,
                        num_heads=self.decoder_embed_dim // 64,
                        input_size=self.feat_sizes[idx],
                        mlp_ratio=s.mlp_ratio,
                        qkv_bias=s.qkv_bias,
                        kernel_q=(),
                        kernel_kv=tuple(self.dec_kv_kernel),
                        stride_q=(),
                        stride_kv=tuple(self.dec_kv_stride),
                        mode=s.mode,
                        has_cls=s.cls_embed_on,
                        pool_first=s.pool_first,
                        rel_pos_spatial=False,
                        rel_pos_temporal=False,
                        rel_pos_zero_init=False,
                        residual_pooling=False,
                        dim_mul_in_att=False,
                        separate_qkv=False,
                        name=f"transforms_{idx}_{d}",
                    )(x, thw)
                    head_dim = self.decoder_embed_dim
            x = LayerNorm(epsilon=1e-6, name=f"transform_norm_{idx}")(x)
            if s.cls_embed_on:
                x = x[:, 1:]
            x = nn.Dense(
                self.num_classes[idx],
                kernel_init=trunc02,
                dtype=jnp.float32,
                name=f"projections_{idx}",
            )(x)
            outputs.append(x)
        return outputs


# ----------------------------------------------------------------- model


class MaskMViT(nn.Module):
    """MaskFeat forward (reference _maskfeat_forward:550-645): mask-token
    substitution on the full grid, MViT blocks, per-depth prediction
    heads. Returns (per-depth predictions for ALL positions, per-depth
    boolean masks at feature resolution)."""

    spec: MViTSpec
    pretrain_depth: Tuple[int, ...] = (15,)
    hog_nbins: int = 9
    hog_cell: int = 8
    decoder_depth: int = 0
    decoder_embed_dim: int = 512
    dec_kv_kernel: Tuple[int, ...] = ()
    dec_kv_stride: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, state=None, rng=None, train: bool = False):
        s = self.spec
        if isinstance(x, (list, tuple)):
            x = x[0]
        b = x.shape[0]
        x = nn.Conv(
            s.embed_dim,
            kernel_size=tuple(s.patch_kernel),
            strides=tuple(s.patch_stride),
            padding=tuple((p, p) for p in s.patch_padding),
            kernel_init=trunc02,
            bias_init=nn.initializers.constant(0.02),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        t, hh, ww = x.shape[1:4]
        x = x.reshape(b, -1, s.embed_dim)
        n = x.shape[1]

        # interpolate the loader mask to the (H, W) token grid and
        # substitute mask tokens (reference masked.py:577-596)
        mask_token = self.param(
            "mask_token", trunc02, (1, 1, s.embed_dim)
        )
        float_mask = _interp_mask(mask, (hh, ww))  # [B, T?, hh, ww]
        if float_mask.ndim == 3:  # 2-D mask -> broadcast over time
            float_mask = jnp.broadcast_to(
                float_mask[:, None], (b, t, hh, ww)
            )
        flat_mask = float_mask.reshape(b, n, 1).astype(x.dtype)
        x = x * (1 - flat_mask) + mask_token.astype(x.dtype) * flat_mask

        if s.cls_embed_on:
            cls_token = self.param("cls_token", trunc02, (1, 1, s.embed_dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_token, (b, 1, s.embed_dim)).astype(x.dtype), x],
                axis=1,
            )

        if s.use_abs_pos:
            if s.sep_pos_embed:
                p_t, p_h, p_w = s.patch_dims
                pe_s = self.param(
                    "pos_embed_spatial", trunc02, (1, p_h * p_w, s.embed_dim)
                )
                pe_t = self.param(
                    "pos_embed_temporal", trunc02, (1, p_t, s.embed_dim)
                )
                pe = jnp.tile(pe_s, (1, p_t, 1)) + jnp.repeat(
                    pe_t, p_h * p_w, axis=1
                )
                if s.cls_embed_on:
                    pe_c = self.param(
                        "pos_embed_class", trunc02, (1, 1, s.embed_dim)
                    )
                    pe = jnp.concatenate([pe_c, pe], axis=1)
            else:
                pe = self.param(
                    "pos_embed", trunc02,
                    (1, n + (1 if s.cls_embed_on else 0), s.embed_dim),
                )
            x = x + pe.astype(x.dtype)

        if s.norm_stem:
            x = LayerNorm(epsilon=s.norm_eps, name="norm_stem")(x)

        plan = s.block_plan()
        thw = s.patch_dims
        block_outputs = []
        feat_sizes = []
        head_dims = []
        depth_used = max(self.pretrain_depth)
        for i, blk in enumerate(plan[: depth_used + 1]):
            x, thw = MultiScaleBlock(
                dim=blk["dim"],
                dim_out=blk["dim_out"],
                num_heads=blk["num_heads"],
                input_size=blk["input_size"],
                mlp_ratio=s.mlp_ratio,
                qkv_bias=s.qkv_bias,
                kernel_q=blk["kernel_q"],
                kernel_kv=blk["kernel_kv"],
                stride_q=blk["stride_q"],
                stride_kv=blk["stride_kv"],
                mode=s.mode,
                has_cls=s.cls_embed_on,
                pool_first=s.pool_first,
                rel_pos_spatial=s.rel_pos_spatial,
                rel_pos_temporal=s.rel_pos_temporal,
                rel_pos_zero_init=s.rel_pos_zero_init,
                residual_pooling=s.residual_pooling,
                dim_mul_in_att=s.dim_mul_in_att,
                separate_qkv=s.separate_qkv,
                layer_scale_init_value=s.layer_scale_init_value,
                drop_path=0.0,
                norm_eps=s.norm_eps,
                dtype=self.dtype,
                is_training=train,
                name=f"blocks_{i}",
            )(x, thw)
            if i in self.pretrain_depth:
                block_outputs.append(x)
                feat_sizes.append(tuple(thw))
                head_dims.append(blk["dim_out"])

        num_classes = tuple(
            3 * self.hog_nbins
            * (feat_stride[-1] // self.hog_cell) ** 2
            for feat_stride in [
                calc_mvit_feature_geometry(s)[1][d] for d in self.pretrain_depth
            ]
        )
        preds = MSSeparateHead(
            spec=s,
            pretrain_depth=tuple(self.pretrain_depth),
            num_classes=num_classes,
            head_dims=tuple(head_dims),
            feat_sizes=tuple(feat_sizes),
            decoder_depth=self.decoder_depth,
            decoder_embed_dim=self.decoder_embed_dim,
            dec_kv_kernel=self.dec_kv_kernel,
            dec_kv_stride=self.dec_kv_stride,
            name="pred_head",
        )(block_outputs, thw)

        # per-depth boolean masks at feature resolution
        # (reference _get_multiscale_mask:172-184)
        feat_size, _ = calc_mvit_feature_geometry(s)
        out_masks = []
        for d in self.pretrain_depth:
            fs = feat_size[d][-1]
            md = _interp_mask(mask, (fs, fs))
            if md.ndim == 3:
                md = jnp.broadcast_to(
                    md[:, None], (b, feat_size[d][0], fs, fs)
                )
            out_masks.append(md.reshape(b, -1) > 0.5)
        return preds, out_masks


def _interp_mask(mask, size):
    """Nearest-neighbour resize of the trailing two dims
    (F.interpolate default mode)."""
    mask = jnp.asarray(mask, jnp.float32)
    h, w = mask.shape[-2:]
    th, tw = size
    if (h, w) == (th, tw):
        return mask
    yi = (jnp.arange(th) * h // th).astype(jnp.int32)
    xi = (jnp.arange(tw) * w // tw).astype(jnp.int32)
    return mask[..., yi, :][..., xi]


# --------------------------------------------------------------- registry

from vtm.models.build import ModelBundle, compute_dtype, register_model  # noqa: E402


@register_model("MaskMViT")
def _build_maskmvit_bundle(cfg) -> ModelBundle:
    from vtm.merge.policy import MergePolicy

    if cfg.MASK.MAE_ON:
        raise NotImplementedError(
            "the MAE branch is not carried (token-subset encoding breaks "
            "MViT's grid pooling; the reference exercises MaskFeat only)"
        )
    if not cfg.MASK.PRED_HOG:
        raise NotImplementedError("pixel-target MaskFeat is not carried")
    spec = mvit_spec_from_cfg(cfg)
    module = MaskMViT(
        spec=spec,
        pretrain_depth=tuple(cfg.MASK.PRETRAIN_DEPTH),
        decoder_depth=cfg.MASK.DECODER_DEPTH,
        decoder_embed_dim=cfg.MASK.DECODER_EMBED_DIM,
        dec_kv_kernel=tuple(cfg.MASK.DEC_KV_KERNEL),
        dec_kv_stride=tuple(cfg.MASK.DEC_KV_STRIDE),
        dtype=compute_dtype(cfg),
    )
    return ModelBundle(
        module=module, params=None, config=spec,
        policy=MergePolicy(), name="MaskMViT",
    )
