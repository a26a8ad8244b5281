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

The MAE branch (MASK.MAE_ON, reference _mae_forward:470-503) is
carried with a STATIC-shape masking strategy: the kept-token count is
``int(L * (1 - AUG.MASK_RATIO))`` resolved at build time (the
reference derives it from the loader mask's population count — a
dynamic shape). Keep/drop selection is a stable argsort of the noise
(loader mask or uniform random), exactly the reference's shuffle
machinery; the decoder predicts ALL positions and the binary mask
weights the loss (same masked-mean objective).
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
        (bi, ci, binned, hi, wi),
        norm,
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
    pred_hog: bool = True  # False -> pixel targets (MASK.PRED_HOG False)
    time_stride_loss: bool = True
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

        if self.pred_hog:
            num_classes = tuple(
                3 * self.hog_nbins
                * (feat_stride[-1] // self.hog_cell) ** 2
                for feat_stride in [
                    calc_mvit_feature_geometry(s)[1][d]
                    for d in self.pretrain_depth
                ]
            )
        else:  # pixel targets (reference masked.py:39-47)
            num_classes = pixel_num_classes(
                s, self.pretrain_depth, self.time_stride_loss
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


# ----------------------------------------------------------- MAE branch


def _patchify_pixels(imgs, p: int, u: int):
    """[B, T, H, W, C] -> [B, t*h*w, u*p*p*C] with the reference's
    token feature order (masked.py _patchify:185-195: nthwupqc)."""
    b, T, H, W, c = imgs.shape
    t, h, w = T // u, H // p, W // p
    x = imgs.reshape(b, t, u, h, p, w, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t * h * w, u * p * p * c)


def mae_pixel_labels(frames, patch_t_stride: int, p: int,
                     time_stride_loss: bool = True, norm: bool = True):
    """Full-grid pixel targets (reference _get_pixel_label_3d:219-243
    WITHOUT the masked-row selection — the mask weights the loss).
    Works on jnp or np arrays; per-token normalisation uses the
    reference's unbiased variance."""
    if time_stride_loss:
        imgs = frames[:, ::patch_t_stride]
        u = 1
    else:
        imgs = frames
        u = patch_t_stride
    label = _patchify_pixels(imgs, p, u)
    if norm:
        mean = label.mean(axis=-1, keepdims=True)
        var = label.var(axis=-1, keepdims=True, ddof=1)
        label = (label - mean) / (var + 1.0e-6) ** 0.5
    return label


def maskfeat_pixel_labels(spec: MViTSpec, pretrain_depth, frames,
                          time_stride_loss: bool = True, norm: bool = True):
    """Per-depth full-grid pixel targets for the non-MAE MaskFeat path
    (reference _maskfeat_forward:562-570). frames: [B, T, H, W, C]."""
    _, feat_stride = calc_mvit_feature_geometry(spec)
    labels = []
    for depth in pretrain_depth:
        labels.append(
            mae_pixel_labels(
                frames, spec.patch_stride[0], feat_stride[depth][-1],
                time_stride_loss=time_stride_loss, norm=norm,
            )
        )
    return labels


def pixel_num_classes(spec: MViTSpec, pretrain_depth,
                      time_stride_loss: bool = True):
    """Prediction width per depth for pixel targets (masked.py:39-47)."""
    _, feat_stride = calc_mvit_feature_geometry(spec)
    pred_t_sz = 1 if time_stride_loss else spec.patch_stride[0]
    return tuple(
        pred_t_sz * (feat_stride[d][-1] ** 2) * 3 for d in pretrain_depth
    )


class MaskMViTMAE(nn.Module):
    """MAE pretraining forward (reference _mae_forward:470-503):
    random/loader-driven token dropping, encoder over the KEPT subset,
    decoder over the restored full grid with mask tokens, per-depth
    pixel prediction. Returns (preds, labels, masks) — all full-grid
    static shapes; ``masks`` weight the loss (multiple_mse).

    Static-shape contract: ``len_keep = int(L * (1 - mask_ratio))``
    comes from config. With a loader mask, the stable argsort keeps
    unmasked tokens first, so if the mask's population count differs
    from the configured ratio, the split follows the configured ratio
    (documented deviation; the loader's generators produce fixed
    counts). Pooling/rel-pos must be off (the reference's MAE encoder
    would break on a token subset the same way).
    """

    spec: MViTSpec
    pretrain_depth: Tuple[int, ...] = (15,)
    mask_ratio: float = 0.75
    rnd_mask: bool = False
    per_frame_masking: bool = False
    mask_tube: bool = False
    time_stride_loss: bool = True
    norm_pred_pixel: bool = True
    decoder_embed_dim: int = 512
    decoder_sep_pos_embed: bool = False
    decoder_depth: int = 0
    dec_kv_kernel: Tuple[int, ...] = ()
    dec_kv_stride: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, state=None, rng=None,
                 train: bool = False):
        s = self.spec
        if isinstance(x, (list, tuple)):
            x = x[0]
        frames = x
        b = x.shape[0]
        for blk in s.block_plan()[: max(self.pretrain_depth) + 1]:
            assert not blk["kernel_q"] and not blk["kernel_kv"], (
                "the MAE encoder runs on a token subset; pooling "
                "attention requires the full grid (same constraint as "
                "the reference)"
            )
        assert not (s.rel_pos_spatial or s.rel_pos_temporal)

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
        n_full = t * hh * ww
        sp = 1 if s.cls_embed_on else 0

        pos_embed = None
        if s.use_abs_pos and not s.sep_pos_embed:
            if s.use_fixed_sincos_pos:
                table = get_3d_sincos_pos_embed(
                    s.embed_dim, hh, t, s.cls_embed_on
                )[None].astype(np.float32)
                init = lambda key, shape: jnp.asarray(table)
            else:
                init = trunc02
            pos_embed = self.param(
                "pos_embed", init, (1, n_full + sp, s.embed_dim)
            )
        if s.use_fixed_sincos_pos:
            x = x + pos_embed[:, sp:, :].astype(x.dtype)

        # ---- token dropping (reference _mae_random_masking:296-332)
        L = hh * ww if self.per_frame_masking else n_full
        rows = b * t if self.per_frame_masking else b
        len_keep = int(L * (1 - self.mask_ratio))
        assert len_keep > 1
        if self.rnd_mask or mask is None:
            key = self.make_rng("mask")
            if self.mask_tube and not self.per_frame_masking:
                noise = jax.random.uniform(key, (b, 1, hh * ww))
                noise = jnp.tile(noise, (1, t, 1)).reshape(rows, L)
            else:
                noise = jax.random.uniform(key, (rows, L))
        else:
            noise = _interp_mask(jnp.asarray(mask, jnp.float32), (hh, ww))
            if noise.ndim == 3:  # 2-D mask -> tube over time
                noise = jnp.broadcast_to(noise[:, None], (b, t, hh, ww))
            noise = noise.reshape(rows, L)
        ids_shuffle = jnp.argsort(noise, axis=1, stable=True)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_rows = x.reshape(rows, L, s.embed_dim)
        x_kept = jnp.take_along_axis(x_rows, ids_keep[:, :, None], axis=1)
        bin_mask = jnp.ones((rows, L), jnp.float32)
        bin_mask = bin_mask.at[:, :len_keep].set(0.0)
        bin_mask = jnp.take_along_axis(bin_mask, ids_restore, axis=1)
        out_mask = bin_mask.reshape(b, n_full)
        x = x_kept.reshape(b, -1, s.embed_dim)

        if s.cls_embed_on:
            cls_token = self.param("cls_token", trunc02, (1, 1, s.embed_dim))
            cls = jnp.broadcast_to(cls_token, (b, 1, s.embed_dim))
            if s.use_fixed_sincos_pos:
                cls = cls + pos_embed[:, :sp, :]
            x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)

        if s.use_abs_pos and not s.use_fixed_sincos_pos:
            # gather the kept tokens' pos embeddings (masked.py:363-404)
            if s.sep_pos_embed:
                p_t, p_h, p_w = t, hh, ww
                pe_s = self.param(
                    "pos_embed_spatial", trunc02, (1, p_h * p_w, s.embed_dim)
                )
                pe_t = self.param(
                    "pos_embed_temporal", trunc02, (1, p_t, s.embed_dim)
                )
                pe = jnp.tile(pe_s, (1, p_t, 1)) + jnp.repeat(
                    pe_t, p_h * p_w, axis=1
                )
            else:
                pe = pos_embed[:, sp:, :]
            pe = jnp.broadcast_to(pe, (b, n_full, s.embed_dim))
            pe = pe.reshape(rows, L, s.embed_dim)
            pe = jnp.take_along_axis(pe, ids_keep[:, :, None], axis=1)
            pe = pe.reshape(b, -1, s.embed_dim)
            if s.cls_embed_on:
                pe_c = (
                    self.param(
                        "pos_embed_class", trunc02, (1, 1, s.embed_dim)
                    )
                    if s.sep_pos_embed
                    else pos_embed[:, :sp, :]
                )
                pe = jnp.concatenate(
                    [jnp.broadcast_to(pe_c, (b, 1, s.embed_dim)), pe], axis=1
                )
            x = x + pe.astype(x.dtype)

        # ---- encoder blocks over the kept subset
        plan = s.block_plan()
        thw = (t, hh, ww)  # nominal only; no pooling reshapes happen
        for i, blk in enumerate(plan[: max(self.pretrain_depth) + 1]):
            x, thw = MultiScaleBlock(
                dim=blk["dim"],
                dim_out=blk["dim_out"],
                num_heads=blk["num_heads"],
                input_size=blk["input_size"],
                mlp_ratio=s.mlp_ratio,
                qkv_bias=s.qkv_bias,
                kernel_q=(),
                kernel_kv=(),
                stride_q=(),
                stride_kv=(),
                mode=s.mode,
                has_cls=s.cls_embed_on,
                pool_first=s.pool_first,
                rel_pos_spatial=False,
                rel_pos_temporal=False,
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
        x = LayerNorm(epsilon=s.norm_eps, name="norm")(x)

        # ---- decoder (reference _mae_forward_decoder:415-468)
        dec_dim = self.decoder_embed_dim
        x = nn.Dense(
            dec_dim, kernel_init=trunc02, dtype=self.dtype,
            name="decoder_embed",
        )(x)
        mask_token = self.param("mask_token", trunc02, (1, 1, dec_dim))
        core = x[:, sp:, :].reshape(rows, len_keep, dec_dim)
        mt = jnp.broadcast_to(
            mask_token.astype(core.dtype), (rows, L - len_keep, dec_dim)
        )
        x_ = jnp.concatenate([core, mt], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x_ = x_.reshape(b, n_full, dec_dim)
        x = jnp.concatenate([x[:, :sp, :], x_], axis=1)

        if s.use_abs_pos:
            if self.decoder_sep_pos_embed:
                dpe_s = self.param(
                    "dec_pos_embed_spatial", trunc02, (1, hh * ww, dec_dim)
                )
                dpe_t = self.param(
                    "dec_pos_embed_temporal", trunc02, (1, t, dec_dim)
                )
                dpe = jnp.tile(dpe_s, (1, t, 1)) + jnp.repeat(
                    dpe_t, hh * ww, axis=1
                )
                if s.cls_embed_on:
                    dpe_c = self.param(
                        "dec_pos_embed_class", trunc02, (1, 1, dec_dim)
                    )
                    dpe = jnp.concatenate([dpe_c, dpe], axis=1)
            else:
                dpe = self.param(
                    "decoder_pos_embed", trunc02, (1, n_full + sp, dec_dim)
                )
            x = x + dpe.astype(x.dtype)

        num_classes = pixel_num_classes(
            s, self.pretrain_depth, self.time_stride_loss
        )
        preds = MSSeparateHead(
            spec=s,
            pretrain_depth=tuple(self.pretrain_depth),
            num_classes=num_classes,
            head_dims=(dec_dim,) * len(self.pretrain_depth),
            feat_sizes=((t, hh, ww),) * len(self.pretrain_depth),
            decoder_depth=self.decoder_depth,
            decoder_embed_dim=dec_dim,
            dec_kv_kernel=self.dec_kv_kernel,
            dec_kv_stride=self.dec_kv_stride,
            name="pred_head",
        )([x] * len(self.pretrain_depth), (t, hh, ww))

        _, feat_stride = calc_mvit_feature_geometry(s)
        labels = [
            mae_pixel_labels(
                frames, s.patch_stride[0], feat_stride[d][-1],
                time_stride_loss=self.time_stride_loss,
                norm=self.norm_pred_pixel,
            )
            for d in self.pretrain_depth
        ]
        masks = [out_mask > 0.5] * len(self.pretrain_depth)
        return preds, labels, masks


# --------------------------------------------------------------- registry

from vtm.models.build import ModelBundle, compute_dtype, register_model  # noqa: E402


@register_model("MaskMViT")
def _build_maskmvit_bundle(cfg) -> ModelBundle:
    from vtm.merge.policy import MergePolicy

    spec = mvit_spec_from_cfg(cfg)
    if cfg.MASK.MAE_ON:
        assert not cfg.MASK.PRED_HOG, (
            "MAE carries the pixel branch; HOG targets use MaskFeat "
            "(MASK.MAE_ON False)"
        )
        module = MaskMViTMAE(
            spec=spec,
            pretrain_depth=tuple(cfg.MASK.PRETRAIN_DEPTH),
            mask_ratio=cfg.AUG.MASK_RATIO,
            rnd_mask=cfg.MASK.MAE_RND_MASK,
            per_frame_masking=cfg.MASK.PER_FRAME_MASKING,
            mask_tube=cfg.AUG.MASK_TUBE,
            time_stride_loss=cfg.MASK.TIME_STRIDE_LOSS,
            norm_pred_pixel=cfg.MASK.NORM_PRED_PIXEL,
            decoder_embed_dim=cfg.MASK.DECODER_EMBED_DIM,
            decoder_sep_pos_embed=cfg.MASK.DECODER_SEP_POS_EMBED,
            decoder_depth=cfg.MASK.DECODER_DEPTH,
            dec_kv_kernel=tuple(cfg.MASK.DEC_KV_KERNEL),
            dec_kv_stride=tuple(cfg.MASK.DEC_KV_STRIDE),
            dtype=compute_dtype(cfg),
        )
        return ModelBundle(
            module=module, params=None, config=spec,
            policy=MergePolicy(), name="MaskMViT",
        )
    if cfg.MASK.MAE_RND_MASK:
        # The reference's rnd-mask MaskFeat branch (_maskfeat_forward:
        # 552-556) emits the token-grid mask as the label-selection
        # mask, which `tmp_hog[output_mask]` (_get_hog_label_3d:290)
        # shape-mismatches whenever Q-pooling shrinks the feature grid
        # before the pretrain depth — i.e. every shipped MaskFeat
        # config. Refuse loudly instead of silently ignoring the flag.
        raise NotImplementedError(
            "MASK.MAE_RND_MASK requires MASK.MAE_ON (the reference's "
            "MaskFeat+rnd-mask path is incoherent for pooled MViTs)"
        )
    module = MaskMViT(
        spec=spec,
        pretrain_depth=tuple(cfg.MASK.PRETRAIN_DEPTH),
        pred_hog=cfg.MASK.PRED_HOG,
        time_stride_loss=cfg.MASK.TIME_STRIDE_LOSS,
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
