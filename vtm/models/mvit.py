"""MViT (Multiscale Vision Transformers, v1/v2) — native flax.

Functional parity targets:
  slowfast/models/video_model_builder.py:809-1267 (MViT)
  slowfast/models/attention.py (attention_pool:14-49,
    cal_rel_pos_spatial:67-119, cal_rel_pos_temporal:121-161,
    MultiScaleAttention:163-446, MultiScaleBlock:448-568)
  slowfast/models/utils.py (get_3d_sincos_pos_embed:56-101)

TPU-first notes:
- thw shapes are static per block (pooling strides are config), so the
  whole stack compiles once with per-stage shapes — same design as the
  ToMe models.
- The relative-position distance tables (dist_h/dist_w/dist_t) are
  numpy constants computed at trace time; Rh/Rw/Rt are static-index
  gathers.
- Pooling convs run depthwise on [B*heads, T, H, W, head_dim]
  channels-last.

The reversible encoder (MVIT.REV) lives in vtm/models/mvit_rev.py; the
MaskFeat/MAE pretraining heads in vtm/models/masked.py; the AVA
detection (ROI) head is wired below via vtm/models/roi_head.py.
Out of scope (documented): `conv_unshared` mode (unused by any
reference config).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vtm.models.common import LayerNorm, Mlp
from vtm.models.convnet import round_width

trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


# ----------------------------------------------------------- pos embeds


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=float)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int, grid_size: int, t_size: int, cls_token: bool = False
) -> np.ndarray:
    """Reference slowfast/models/utils.py:56-101."""
    assert embed_dim % 4 == 0
    dim_sp, dim_t = embed_dim // 4 * 3, embed_dim // 4
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_h, grid_h), axis=0)  # w first
    emb_h = get_1d_sincos_pos_embed_from_grid(dim_sp // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(dim_sp // 2, grid[1])
    pos_sp = np.concatenate([emb_h, emb_w], axis=1)
    pos_t = get_1d_sincos_pos_embed_from_grid(
        dim_t, np.arange(t_size, dtype=np.float32)
    )
    pos_t = np.repeat(pos_t[:, np.newaxis, :], grid_size ** 2, axis=1)
    pos_sp = np.repeat(pos_sp[np.newaxis, :, :], t_size, axis=0)
    pos = np.concatenate([pos_t, pos_sp], axis=-1).reshape(-1, embed_dim)
    if cls_token:
        pos = np.concatenate([np.zeros([1, embed_dim]), pos], axis=0)
    return pos


# ------------------------------------------------------- rel pos helpers


def _get_rel_pos(rel_pos: jax.Array, d: int) -> jax.Array:
    """Interpolate trained rel-pos tables to distance d
    (reference attention.py:51-65)."""
    if rel_pos.shape[0] == d:
        return rel_pos
    return jax.image.resize(rel_pos, (d, rel_pos.shape[1]), method="linear")


def _dist_table(q_n: int, k_n: int) -> np.ndarray:
    q_ratio = max(k_n / q_n, 1.0)
    k_ratio = max(q_n / k_n, 1.0)
    dist = (
        np.arange(q_n)[:, None] * q_ratio - np.arange(k_n)[None, :] * k_ratio
    )
    dist += (k_n - 1) * k_ratio
    return dist.astype(np.int64)


def cal_rel_pos_spatial(
    attn, q, has_cls, q_shape, k_shape, rel_pos_h, rel_pos_w
):
    """Decomposed spatial relative positional bias
    (reference attention.py:67-119). attn: [B, H, qN, kN]."""
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    dh = int(2 * max(q_h, k_h) - 1)
    dw = int(2 * max(q_w, k_w) - 1)
    Rh = _get_rel_pos(rel_pos_h, dh)[_dist_table(q_h, k_h)]  # [qh, kh, c]
    Rw = _get_rel_pos(rel_pos_w, dw)[_dist_table(q_w, k_w)]

    b, n_head, _, dim = q.shape
    r_q = q[:, :, sp:].reshape(b, n_head, q_t, q_h, q_w, dim)
    rel_h_q = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh.astype(q.dtype))
    rel_w_q = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw.astype(q.dtype))
    bias = (
        rel_h_q[:, :, :, :, :, None, :, None]
        + rel_w_q[:, :, :, :, :, None, None, :]
    )  # [B, H, qt, qh, qw, kt?, kh, kw] -> broadcast kt
    bias = jnp.broadcast_to(
        bias, (b, n_head, q_t, q_h, q_w, k_t, k_h, k_w)
    ).reshape(b, n_head, q_t * q_h * q_w, k_t * k_h * k_w)
    if sp:
        bias = jnp.pad(bias, [(0, 0), (0, 0), (1, 0), (1, 0)])
    return attn + bias.astype(attn.dtype)


def cal_rel_pos_temporal(attn, q, has_cls, q_shape, k_shape, rel_pos_t):
    """Temporal relative positional bias (reference attention.py:121-161)."""
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    dt = int(2 * max(q_t, k_t) - 1)
    Rt = _get_rel_pos(rel_pos_t, dt)[_dist_table(q_t, k_t)]  # [qt, kt, c]

    b, n_head, _, dim = q.shape
    r_q = q[:, :, sp:].reshape(b, n_head, q_t, q_h, q_w, dim)
    rel = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt.astype(q.dtype))
    bias = rel[:, :, :, :, :, :, None, None]
    bias = jnp.broadcast_to(
        bias, (b, n_head, q_t, q_h, q_w, k_t, k_h, k_w)
    ).reshape(b, n_head, q_t * q_h * q_w, k_t * k_h * k_w)
    if sp:
        bias = jnp.pad(bias, [(0, 0), (0, 0), (1, 0), (1, 0)])
    return attn + bias.astype(attn.dtype)


# --------------------------------------------------------- pooling attn


def _pool_thw(thw, stride):
    if not stride:
        return tuple(thw)
    # torch pooling with padding k//2: out = (in + 2*(k//2) - k)//s + 1
    # for the kernels used (k = s+1 or fixed odd) this is ceil-div
    return tuple((d + s - 1) // s for d, s in zip(thw, stride))


class AttentionPool(nn.Module):
    """The q/k/v pooling of MultiScaleAttention (attention.py:14-49).

    mode 'conv': depthwise conv + LayerNorm; 'avg'/'max': pooling.
    Operates on [B, H, L, c]; cls token bypasses the pool.
    """

    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    mode: str
    dim_conv: int
    has_cls: bool
    with_norm: bool = True
    norm_eps: float = 1e-6
    # override the default k//2 padding (the reversible max res path
    # pads with stride//2, reversible_mvit.py:345-351)
    pad_override: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(self, x, thw):
        if not self.kernel:
            return x, tuple(thw)
        b, h, _, c = x.shape
        cls_tok = None
        if self.has_cls:
            cls_tok, x = x[:, :, :1], x[:, :, 1:]
        t, hh, ww = thw
        xg = x.reshape(b * h, t, hh, ww, c)
        if self.pad_override is not None:
            pad = tuple((p, p) for p in self.pad_override)
        else:
            pad = tuple((k // 2, k // 2) for k in self.kernel)
        if self.mode == "conv":
            xg = nn.Conv(
                self.dim_conv,
                kernel_size=tuple(self.kernel),
                strides=tuple(self.stride),
                padding=pad,
                feature_group_count=self.dim_conv,
                use_bias=False,
                kernel_init=trunc02,
                name="pool",
            )(xg)
        elif self.mode == "max":
            xg = nn.max_pool(xg, tuple(self.kernel), tuple(self.stride), pad)
        elif self.mode == "avg":
            xg = nn.avg_pool(xg, tuple(self.kernel), tuple(self.stride), pad,
                             count_include_pad=True)
        else:
            raise NotImplementedError(f"Unsupported mode {self.mode}")
        new_thw = xg.shape[1:4]
        x = xg.reshape(b, h, -1, c)
        if cls_tok is not None:
            x = jnp.concatenate([cls_tok, x], axis=2)
        if self.mode == "conv" and self.with_norm:
            x = LayerNorm(epsilon=self.norm_eps, name="norm")(x)
        return x, tuple(new_thw)


class MultiScaleAttention(nn.Module):
    """Pooling attention (reference attention.py:163-446)."""

    dim_out: int
    num_heads: int
    input_size: Tuple[int, int, int]
    qkv_bias: bool
    kernel_q: Tuple[int, ...]
    kernel_kv: Tuple[int, ...]
    stride_q: Tuple[int, ...]
    stride_kv: Tuple[int, ...]
    mode: str
    has_cls: bool
    pool_first: bool
    rel_pos_spatial: bool
    rel_pos_temporal: bool
    rel_pos_zero_init: bool
    residual_pooling: bool
    separate_qkv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, thw, x_res=None):
        """x_res (optional, [B, heads, L, c]): an external residual to
        pool through the SAME pool_q conv/norm (weight sharing used by
        the reversible StageTransitionBlock, reference
        reversible_mvit.py:381-407). When given, returns a third value:
        the pooled residual."""
        b, n, dim_in = x.shape
        head_dim = self.dim_out // self.num_heads
        scale = head_dim ** -0.5
        kernel_q, kernel_kv = self.kernel_q, self.kernel_kv
        if math.prod(kernel_q or (1,)) == 1 and math.prod(self.stride_q or (1,)) == 1:
            kernel_q = ()
        if math.prod(kernel_kv or (1,)) == 1 and math.prod(self.stride_kv or (1,)) == 1:
            kernel_kv = ()

        dense = lambda d, name: nn.Dense(
            d, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=trunc02, bias_init=nn.initializers.constant(0.02),
            name=name,
        )
        if self.pool_first:
            if self.mode == "conv_unshared":
                raise NotImplementedError("conv_unshared is out of scope")
            dim_conv = dim_in // self.num_heads
            xh = x.reshape(b, n, self.num_heads, -1).transpose(0, 2, 1, 3)
            q = k = v = xh
        else:
            dim_conv = self.dim_out // self.num_heads
            if not self.separate_qkv:
                qkv = dense(3 * self.dim_out, "qkv")(x)
                qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
                qkv = qkv.transpose(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
            else:
                q = dense(self.dim_out, "q")(x).reshape(
                    b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
                k = dense(self.dim_out, "k")(x).reshape(
                    b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
                v = dense(self.dim_out, "v")(x).reshape(
                    b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        pool_q_mod = AttentionPool(
            kernel_q, self.stride_q, self.mode, dim_conv, self.has_cls,
            name="pool_q_mod",
        )
        q, q_shape = pool_q_mod(q, thw)
        pooled_res = None
        if x_res is not None:
            pooled_res, _ = pool_q_mod(x_res, thw)
        k, k_shape = AttentionPool(
            kernel_kv, self.stride_kv, self.mode, dim_conv, self.has_cls,
            name="pool_k_mod",
        )(k, thw)
        v, v_shape = AttentionPool(
            kernel_kv, self.stride_kv, self.mode, dim_conv, self.has_cls,
            name="pool_v_mod",
        )(v, thw)

        if self.pool_first:
            def project(z, z_shape, name):
                zn = math.prod(z_shape) + (1 if self.has_cls else 0)
                z = z.transpose(0, 2, 1, 3).reshape(b, zn, -1)
                z = dense(self.dim_out, name)(z)
                return z.reshape(b, zn, self.num_heads, head_dim).transpose(
                    0, 2, 1, 3
                )

            q = project(q, q_shape, "q")
            v = project(v, v_shape, "v")
            k = project(k, k_shape, "k")

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        rel_init = (
            nn.initializers.zeros if self.rel_pos_zero_init else trunc02
        )
        if self.rel_pos_spatial:
            size = self.input_size[1]
            sq = self.stride_q[1] if self.stride_q else 1
            skv = self.stride_kv[1] if self.stride_kv else 1
            rel_sp_dim = 2 * max(size // sq, size // skv) - 1
            rel_pos_h = self.param("rel_pos_h", rel_init, (rel_sp_dim, head_dim))
            rel_pos_w = self.param("rel_pos_w", rel_init, (rel_sp_dim, head_dim))
            attn = cal_rel_pos_spatial(
                attn, q, self.has_cls, q_shape, k_shape, rel_pos_h, rel_pos_w
            )
        if self.rel_pos_temporal:
            rel_pos_t = self.param(
                "rel_pos_t", rel_init, (2 * self.input_size[0] - 1, head_dim)
            )
            attn = cal_rel_pos_temporal(
                attn, q, self.has_cls, q_shape, k_shape, rel_pos_t
            )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)

        if self.residual_pooling:
            # reference attention.py:431-435: residual add of pooled q
            if self.has_cls:
                out = out.at[:, :, 1:, :].add(q[:, :, 1:, :])
            else:
                out = out + q

        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.dim_out)
        out = nn.Dense(
            self.dim_out, dtype=self.dtype, kernel_init=trunc02,
            bias_init=nn.initializers.constant(0.02), name="proj",
        )(out)
        if x_res is not None:
            return out, q_shape, pooled_res
        return out, q_shape


class MultiScaleBlock(nn.Module):
    """Reference attention.py:448-568."""

    dim: int
    dim_out: int
    num_heads: int
    input_size: Tuple[int, int, int]
    mlp_ratio: float
    qkv_bias: bool
    kernel_q: Tuple[int, ...]
    kernel_kv: Tuple[int, ...]
    stride_q: Tuple[int, ...]
    stride_kv: Tuple[int, ...]
    mode: str
    has_cls: bool
    pool_first: bool
    rel_pos_spatial: bool
    rel_pos_temporal: bool
    rel_pos_zero_init: bool
    residual_pooling: bool
    dim_mul_in_att: bool
    separate_qkv: bool
    layer_scale_init_value: float = 0.0
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    # a module FIELD (not a call arg) so nn.remat only needs the thw
    # tuple marked static
    is_training: bool = False

    @nn.compact
    def __call__(self, x, thw):
        train = self.is_training
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim
        x_norm = LayerNorm(epsilon=self.norm_eps, name="norm1")(x)
        x_block, thw_new = MultiScaleAttention(
            dim_out=att_dim,
            num_heads=self.num_heads,
            input_size=self.input_size,
            qkv_bias=self.qkv_bias,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            mode=self.mode,
            has_cls=self.has_cls,
            pool_first=self.pool_first,
            rel_pos_spatial=self.rel_pos_spatial,
            rel_pos_temporal=self.rel_pos_temporal,
            rel_pos_zero_init=self.rel_pos_zero_init,
            residual_pooling=self.residual_pooling,
            separate_qkv=self.separate_qkv,
            dtype=self.dtype,
            name="attn",
        )(x_norm, thw)

        proj = None
        if self.dim != self.dim_out:
            proj = nn.Dense(
                self.dim_out, dtype=self.dtype, kernel_init=trunc02,
                bias_init=nn.initializers.constant(0.02), name="proj",
            )
        if self.dim_mul_in_att and proj is not None:
            x = proj(x_norm)

        # skip-path pooling (max-pool with kernel s+1) — attention.py:539
        stride_skip = self.stride_q
        if stride_skip and math.prod(stride_skip) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in stride_skip)
            x_res, _ = AttentionPool(
                kernel_skip, tuple(stride_skip), "max",
                dim_conv=0, has_cls=self.has_cls, name="pool_skip",
            )(x[:, None], thw)
            x_res = x_res[:, 0]
        else:
            x_res = x

        def droppath(z):
            if not train or self.drop_path <= 0.0:
                return z
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (z.shape[0],) + (1,) * (z.ndim - 1)
            )
            return z * mask.astype(z.dtype) / keep

        if self.layer_scale_init_value > 0:
            gamma_1 = self.param(
                "gamma_1",
                nn.initializers.constant(self.layer_scale_init_value),
                (att_dim,),
            )
            x_block = x_block * gamma_1.astype(x_block.dtype)
        x = x_res + droppath(x_block)
        x_norm = LayerNorm(epsilon=self.norm_eps, name="norm2")(x)
        x_mlp = Mlp(
            int(att_dim * self.mlp_ratio), self.dim_out, dtype=self.dtype,
            name="mlp",
        )(x_norm)
        if not self.dim_mul_in_att and proj is not None:
            x = proj(x_norm)
        if self.layer_scale_init_value > 0:
            gamma_2 = self.param(
                "gamma_2",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim_out,),
            )
            x_mlp = x_mlp * gamma_2.astype(x_mlp.dtype)
        x = x + droppath(x_mlp)
        return x, thw_new


# --------------------------------------------------------------- model


def _mvit_head(x, s, train: bool):
    """Classification head: Dense, or the SSL MLP projection when
    CONTRASTIVE.NUM_MLP_LAYERS > 1 (reference TransformerBasicHead,
    head_helper.py:399-414)."""
    if s.mlp_layers > 1:
        from vtm.models.convnet import MLPHead

        logits = MLPHead(
            s.num_classes, s.mlp_dim, s.mlp_layers, bn_on=s.mlp_bn,
            name="head",
        )(x, train=train)
    else:
        logits = nn.Dense(
            s.num_classes,
            dtype=jnp.float32,
            kernel_init=trunc02,
            bias_init=nn.initializers.constant(0.02),
            name="head",
        )(x)
    if not train:
        if s.head_act == "softmax":
            logits = jax.nn.softmax(logits, axis=-1)
        elif s.head_act == "sigmoid":
            logits = jax.nn.sigmoid(logits)
    return logits


@dataclasses.dataclass(frozen=True)
class MViTSpec:
    """Static arch parameters (cfg.MVIT.* + input geometry)."""

    num_classes: Union[int, Tuple[int, ...]]
    num_frames: int
    crop_size: int
    in_chans: int
    embed_dim: int
    num_heads: int
    depth: int
    mlp_ratio: float
    qkv_bias: bool
    mode: str
    pool_first: bool
    cls_embed_on: bool
    use_mean_pooling: bool
    use_abs_pos: bool
    use_fixed_sincos_pos: bool
    sep_pos_embed: bool
    rel_pos_spatial: bool
    rel_pos_temporal: bool
    rel_pos_zero_init: bool
    residual_pooling: bool
    dim_mul_in_att: bool
    separate_qkv: bool
    patch_kernel: Tuple[int, int, int]
    patch_stride: Tuple[int, int, int]
    patch_padding: Tuple[int, int, int]
    patch_2d: bool
    dim_mul: Tuple[Tuple[int, float], ...]
    head_mul: Tuple[Tuple[int, float], ...]
    pool_q_stride: Tuple[Tuple[int, ...], ...]
    pool_kv_stride: Tuple[Tuple[int, ...], ...]
    pool_kv_stride_adaptive: Optional[Tuple[int, int, int]]
    pool_kvq_kernel: Optional[Tuple[int, int, int]]
    norm_stem: bool
    layer_scale_init_value: float
    droppath_rate: float
    dropout_rate: float
    head_act: str
    head_init_scale: float
    norm_eps: float = 1e-6
    # reversible encoder (MVIT.REV, reference reversible_mvit.py)
    rev_enable: bool = False
    rev_respath_fuse: str = "concat"
    rev_buffer_layers: Tuple[int, ...] = ()
    rev_res_path: str = "conv"
    rev_pre_q_fusion: str = "avg"
    # AVA detection head (DETECTION.*, video_model_builder.py:1057)
    detection: bool = False
    roi_resolution: int = 7
    roi_scale_factor: int = 16
    roi_aligned: bool = True
    # SSL projection head (TransformerBasicHead MLP path,
    # head_helper.py:399-414 — the contrastive 'mvit' arch)
    mlp_layers: int = 1
    mlp_dim: int = 2048
    mlp_bn: bool = False

    @property
    def patch_dims(self) -> Tuple[int, int, int]:
        return (
            self.num_frames // self.patch_stride[0],
            self.crop_size // self.patch_stride[1],
            self.crop_size // self.patch_stride[2],
        )

    def _muls(self):
        dim_mul = np.ones(self.depth + 1)
        head_mul = np.ones(self.depth + 1)
        for i, m in self.dim_mul:
            dim_mul[int(i)] = m
        for i, m in self.head_mul:
            head_mul[int(i)] = m
        return dim_mul, head_mul

    def _pool_schedule(self):
        """Per-depth pool kernels/strides (video_model_builder.py:924-974)."""
        depth = self.depth
        pool_q = [[] for _ in range(depth)]
        pool_kv = [[] for _ in range(depth)]
        stride_q = [[] for _ in range(depth)]
        stride_kv = [[] for _ in range(depth)]
        for entry in self.pool_q_stride:
            i = int(entry[0])
            stride_q[i] = list(entry[1:])
            pool_q[i] = (
                list(self.pool_kvq_kernel)
                if self.pool_kvq_kernel is not None
                else [s + 1 if s > 1 else s for s in entry[1:]]
            )
        kv_stride = self.pool_kv_stride
        if self.pool_kv_stride_adaptive is not None:
            _stride_kv = list(self.pool_kv_stride_adaptive)
            kv_stride = []
            for i in range(depth):
                if len(stride_q[i]) > 0:
                    _stride_kv = [
                        max(_stride_kv[d] // stride_q[i][d], 1)
                        for d in range(len(_stride_kv))
                    ]
                kv_stride.append([i] + _stride_kv)
        for entry in kv_stride:
            i = int(entry[0])
            stride_kv[i] = list(entry[1:])
            pool_kv[i] = (
                list(self.pool_kvq_kernel)
                if self.pool_kvq_kernel is not None
                else [s + 1 if s > 1 else s for s in entry[1:]]
            )
        return pool_q, pool_kv, stride_q, stride_kv

    def block_plan(self):
        """Per-block (num_heads, dim_out, pool_q, pool_kv, stride_q,
        stride_kv, input_size) — the schedule math of
        video_model_builder.py:924-1052."""
        depth = self.depth
        dim_mul, head_mul = self._muls()
        pool_q, pool_kv, stride_q, stride_kv = self._pool_schedule()

        plan = []
        embed_dim = self.embed_dim
        num_heads = self.num_heads
        input_size = list(self.patch_dims)
        for i in range(depth):
            num_heads = round_width(num_heads, head_mul[i])
            if self.dim_mul_in_att:
                dim_out = round_width(
                    embed_dim, dim_mul[i],
                    divisor=round_width(num_heads, head_mul[i]),
                )
            else:
                dim_out = round_width(
                    embed_dim, dim_mul[i + 1],
                    divisor=round_width(num_heads, head_mul[i + 1]),
                )
            plan.append(
                dict(
                    dim=embed_dim,
                    dim_out=dim_out,
                    num_heads=num_heads,
                    input_size=tuple(input_size),
                    kernel_q=tuple(pool_q[i]),
                    kernel_kv=tuple(pool_kv[i]),
                    stride_q=tuple(stride_q[i]),
                    stride_kv=tuple(stride_kv[i]),
                )
            )
            if len(stride_q[i]) > 0:
                input_size = [
                    size // s for size, s in zip(input_size, stride_q[i])
                ]
            embed_dim = dim_out
        return plan

    def rev_block_plan(self):
        """Per-layer schedule for the reversible encoder — the dim logic
        of reversible_mvit.py:74-128 ("upsampling inside the MHPA": the
        channel change is localised to the stage-transition layer whose
        dim_mul fires, keeping the surrounding layers reversible)."""
        depth = self.depth
        dim_mul, head_mul = self._muls()
        pool_q, pool_kv, stride_q, stride_kv = self._pool_schedule()
        concat_fuse = "concat" in self.rev_pre_q_fusion
        plan = []
        embed_dim = self.embed_dim
        num_heads = self.num_heads
        input_size = list(self.patch_dims)
        for i in range(depth):
            num_heads = round_width(num_heads, head_mul[i])
            embed_dim = round_width(
                embed_dim, dim_mul[i - 1] if i > 0 else 1.0, divisor=num_heads
            )
            dim_out = round_width(
                embed_dim,
                dim_mul[i],
                divisor=round_width(num_heads, head_mul[i + 1]),
            )
            is_transition = i in self.rev_buffer_layers
            input_mult = 2 if (is_transition and concat_fuse) else 1
            plan.append(
                dict(
                    dim=embed_dim * input_mult,
                    # reference: dim_out*input_mult//dimout_correction, and
                    # dimout_correction == input_mult in every branch
                    dim_out=dim_out,
                    num_heads=num_heads,
                    input_size=tuple(input_size),
                    kernel_q=tuple(pool_q[i]),
                    kernel_kv=tuple(pool_kv[i]),
                    stride_q=tuple(stride_q[i]),
                    stride_kv=tuple(stride_kv[i]),
                    is_transition=is_transition,
                )
            )
            if len(stride_q[i]) > 0:
                input_size = [
                    size // s for size, s in zip(input_size, stride_q[i])
                ]
        return plan

    @property
    def rev_final_dim(self) -> int:
        """Single-stream channel width after the reversible encoder
        (video_model_builder.py:987-989)."""
        dim_mul, _ = self._muls()
        return round_width(
            self.embed_dim, float(np.prod(dim_mul)), divisor=self.num_heads
        )


def mvit_spec_from_cfg(cfg) -> MViTSpec:
    assert cfg.DATA.TRAIN_CROP_SIZE == cfg.DATA.TEST_CROP_SIZE
    t = lambda v: tuple(tuple(e) if isinstance(e, (list, tuple)) else e for e in v)
    return MViTSpec(
        num_classes=cfg.MODEL.NUM_CLASSES,
        num_frames=cfg.DATA.NUM_FRAMES,
        crop_size=cfg.DATA.TRAIN_CROP_SIZE,
        in_chans=cfg.DATA.INPUT_CHANNEL_NUM[0],
        embed_dim=cfg.MVIT.EMBED_DIM,
        num_heads=cfg.MVIT.NUM_HEADS,
        depth=cfg.MVIT.DEPTH,
        mlp_ratio=cfg.MVIT.MLP_RATIO,
        qkv_bias=cfg.MVIT.QKV_BIAS,
        mode=cfg.MVIT.MODE,
        pool_first=cfg.MVIT.POOL_FIRST,
        cls_embed_on=cfg.MVIT.CLS_EMBED_ON,
        use_mean_pooling=cfg.MVIT.USE_MEAN_POOLING,
        use_abs_pos=cfg.MVIT.USE_ABS_POS,
        use_fixed_sincos_pos=cfg.MVIT.USE_FIXED_SINCOS_POS,
        sep_pos_embed=cfg.MVIT.SEP_POS_EMBED,
        rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
        rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
        rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
        residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
        dim_mul_in_att=cfg.MVIT.DIM_MUL_IN_ATT,
        separate_qkv=cfg.MVIT.SEPARATE_QKV,
        patch_kernel=tuple(cfg.MVIT.PATCH_KERNEL),
        patch_stride=tuple(cfg.MVIT.PATCH_STRIDE),
        patch_padding=tuple(cfg.MVIT.PATCH_PADDING),
        patch_2d=cfg.MVIT.PATCH_2D,
        dim_mul=t(cfg.MVIT.DIM_MUL),
        head_mul=t(cfg.MVIT.HEAD_MUL),
        pool_q_stride=t(cfg.MVIT.POOL_Q_STRIDE),
        pool_kv_stride=t(cfg.MVIT.POOL_KV_STRIDE),
        pool_kv_stride_adaptive=(
            tuple(cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE)
            if cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE is not None
            else None
        ),
        pool_kvq_kernel=(
            tuple(cfg.MVIT.POOL_KVQ_KERNEL)
            if cfg.MVIT.POOL_KVQ_KERNEL is not None
            else None
        ),
        norm_stem=cfg.MVIT.NORM_STEM,
        layer_scale_init_value=cfg.MVIT.LAYER_SCALE_INIT_VALUE,
        droppath_rate=cfg.MVIT.DROPPATH_RATE,
        dropout_rate=cfg.MODEL.DROPOUT_RATE,
        head_act=cfg.MODEL.HEAD_ACT,
        head_init_scale=cfg.MVIT.HEAD_INIT_SCALE,
        rev_enable=cfg.MVIT.REV.ENABLE,
        rev_respath_fuse=cfg.MVIT.REV.RESPATH_FUSE,
        rev_buffer_layers=tuple(cfg.MVIT.REV.BUFFER_LAYERS),
        rev_res_path=cfg.MVIT.REV.RES_PATH,
        rev_pre_q_fusion=cfg.MVIT.REV.PRE_Q_FUSION,
        detection=cfg.DETECTION.ENABLE,
        roi_resolution=cfg.DETECTION.ROI_XFORM_RESOLUTION,
        roi_scale_factor=cfg.DETECTION.SPATIAL_SCALE_FACTOR,
        roi_aligned=cfg.DETECTION.ALIGNED,
        mlp_layers=cfg.CONTRASTIVE.NUM_MLP_LAYERS,
        mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
        mlp_bn=cfg.CONTRASTIVE.BN_MLP,
    )


class MViTModel(nn.Module):
    """Full MViT (video_model_builder.py:809-1267), classification path.

    ``remat=True`` (MODEL.ACT_CHECKPOINT) wraps every block in
    jax.checkpoint — the TPU-native answer to activation memory that
    also covers what the reference's reversible MViT exists for
    (O(depth) -> O(1) stored activations at ~1.3x recompute)."""

    spec: MViTSpec
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, state=None, rng=None, train: bool = False,
                 bboxes=None):
        s = self.spec
        if isinstance(x, (list, tuple)):
            x = x[0]
        b = x.shape[0]
        # patchify: conv3d on [B, T, H, W, C]
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
        thw = x.shape[1:4]
        if tuple(thw) != s.patch_dims:
            # trained-grid pos embeds are interpolated to the input grid
            # (reference _get_pos_embed, video_model_builder.py:1139-1163
            # — the AVA detection path feeds non-square frames)
            assert s.use_abs_pos and not s.use_fixed_sincos_pos, (
                thw, s.patch_dims,
            )
        x = x.reshape(b, -1, s.embed_dim)
        n = int(np.prod(s.patch_dims))

        def to_grid(pe):
            """pos table on the trained patch grid -> the input grid."""
            if tuple(thw) == s.patch_dims:
                return pe
            p_t, p_h, p_w = s.patch_dims
            grid = pe.reshape(1, p_t, p_h, p_w, -1)
            grid = jax.image.resize(
                grid, (1,) + tuple(thw) + (grid.shape[-1],), method="linear"
            )
            return grid.reshape(1, -1, pe.shape[-1])

        pos_embed = None
        if s.use_abs_pos and not s.sep_pos_embed:
            # USE_FIXED_SINCOS_POS initializes this (non-trained) param
            # with the 3-D sincos table; the reference then adds it BOTH
            # before the cls concat and in the abs-pos add
            # (video_model_builder.py:1203-1232)
            if s.use_fixed_sincos_pos:
                table = get_3d_sincos_pos_embed(
                    s.embed_dim, s.patch_dims[1], s.patch_dims[0], s.cls_embed_on
                )[None].astype(np.float32)
                init = lambda key, shape: jnp.asarray(table)
            else:
                init = trunc02
            pos_embed = self.param(
                "pos_embed", init,
                (1, n + (1 if s.cls_embed_on else 0), s.embed_dim),
            )

        sp = 1 if s.cls_embed_on else 0
        if s.use_fixed_sincos_pos:
            x = x + pos_embed[:, sp:, :].astype(x.dtype)

        if s.cls_embed_on:
            cls_token = self.param(
                "cls_token", trunc02, (1, 1, s.embed_dim)
            )
            cls = jnp.broadcast_to(cls_token, (b, 1, s.embed_dim)).astype(x.dtype)
            if s.use_fixed_sincos_pos:
                cls = cls + pos_embed[:, :1, :].astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)

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
                pe = to_grid(pe)
                if s.cls_embed_on:
                    pe_c = self.param(
                        "pos_embed_class", trunc02, (1, 1, s.embed_dim)
                    )
                    pe = jnp.concatenate([pe_c, pe], axis=1)
            else:
                pe = pos_embed
                if tuple(thw) != s.patch_dims:
                    pe_c, pe_grid = pe[:, :sp], pe[:, sp:]
                    pe = jnp.concatenate([pe_c, to_grid(pe_grid)], axis=1)
            x = x + pe.astype(x.dtype)

        if s.norm_stem:
            x = LayerNorm(epsilon=s.norm_eps, name="norm_stem")(x)

        if s.rev_enable:
            # reversible encoder path (video_model_builder.py:1165-1186)
            from vtm.models.mvit_rev import ReversibleMViT, TwoStreamFusion

            assert not s.cls_embed_on, "rev does not allow cls token"
            assert not s.detection, "rev does not support detection"
            x = ReversibleMViT(
                spec=s, dtype=self.dtype, is_training=train,
                name="rev_backbone",
            )(x)
            two_dim = 2 * s.rev_final_dim
            fuse = TwoStreamFusion(
                s.rev_respath_fuse, dim=two_dim, name="fuse"
            )
            norm = LayerNorm(epsilon=s.norm_eps, name="norm")
            if s.use_mean_pooling:
                x = fuse(x, train=train)
                x = norm(x.mean(axis=1))
            else:
                x = norm(x)
                x = fuse(x, train=train)
                x = x.mean(axis=1)
            if train and s.dropout_rate > 0.0:
                x = nn.Dropout(s.dropout_rate, deterministic=False)(x)
            return _mvit_head(x, s, train), state

        plan = s.block_plan()
        dpr = np.linspace(0, s.droppath_rate, s.depth)
        thw = tuple(thw)  # actual input grid (== patch_dims when square)
        block_cls = (
            nn.remat(MultiScaleBlock, static_argnums=(2,))
            if self.remat
            else MultiScaleBlock
        )
        for i, blk in enumerate(plan):
            x, thw = block_cls(
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
                drop_path=float(dpr[i]),
                norm_eps=s.norm_eps,
                dtype=self.dtype,
                is_training=train,
                name=f"blocks_{i}",
            )(x, thw)

        norm = LayerNorm(epsilon=s.norm_eps, name="norm")
        if s.detection and bboxes is not None:
            # ROI path (video_model_builder.py:1239-1248 + :1057-1066):
            # norm, strip cls, refold to the [T, H, W] grid, ROI head
            from vtm.models.roi_head import ResNetRoIHead

            x = norm(x)
            if s.cls_embed_on:
                x = x[:, 1:]
            x = x.reshape(x.shape[0], thw[0], thw[1], thw[2], -1)
            logits = ResNetRoIHead(
                num_classes=s.num_classes,
                resolution=(s.roi_resolution,),
                scale_factor=(s.roi_scale_factor,),
                dropout_rate=s.dropout_rate if train else 0.0,
                act_func=s.head_act,
                aligned=s.roi_aligned,
                name="head",
            )([x], bboxes, train=train)
            return logits, state

        if s.use_mean_pooling:
            if s.cls_embed_on:
                x = x[:, 1:]
            x = norm(x.mean(axis=1))
        elif s.cls_embed_on:
            x = norm(x)[:, 0]
        else:
            x = norm(x).mean(axis=1)

        if train and s.dropout_rate > 0.0:
            x = nn.Dropout(s.dropout_rate, deterministic=False)(x)
        return _mvit_head(x, s, train), state


from vtm.models.build import ModelBundle, compute_dtype, register_model  # noqa: E402


@register_model("MViT")
def _build_mvit_bundle(cfg) -> ModelBundle:
    from vtm.merge.policy import MergePolicy

    spec = mvit_spec_from_cfg(cfg)
    module = MViTModel(
        spec=spec, dtype=compute_dtype(cfg), remat=cfg.MODEL.ACT_CHECKPOINT
    )
    return ModelBundle(
        module=module, params=None, config=spec,
        policy=MergePolicy(), name="MViT",
    )
