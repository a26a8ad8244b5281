"""3D-conv building blocks for the legacy PySlowFast model families
(SlowFast / ResNet / X3D), TPU-native.

Functional parity targets (reference, /root/reference):
  slowfast/models/stem_helper.py      (VideoModelStem, ResNetBasicStem, X3DStem)
  slowfast/models/resnet_helper.py    (Basic/Bottleneck/X3D transforms,
                                       ResBlock, ResStage)
  slowfast/models/nonlocal_helper.py  (Nonlocal)
  slowfast/models/operators.py        (SE, Swish)
  slowfast/models/head_helper.py      (ResNetBasicHead, X3DHead)
  slowfast/models/batchnorm_helper.py (get_norm / SubBatchNorm3d)

TPU-first design notes:
- Channels-last [B, T, H, W, C] everywhere (the framework's video
  layout); XLA tiles NDHWC convs straight onto the MXU. The reference's
  NCTHW layout is a CUDA/cudnn convention we do not copy.
- Parameter tree names mirror the reference module names (`a`, `a_bn`,
  `pathway0_res3`, ...) so the `.pyth` checkpoint converter is a pure
  transpose (OIDHW -> DHWIO), see vtm/checkpoints/convert.py.
- BatchNorm under a jitted data-parallel mesh computes GLOBAL-batch
  statistics (GSPMD sees the whole batch), i.e. sync-BN semantics by
  construction — `BN.NORM_TYPE: sync_batchnorm` needs no extra code.
  SubBatchNorm (multigrid) keeps per-split running stats and aggregates
  them for eval (reference batchnorm_helper.py:40-112).
- `train=True` returns updated batch_stats via flax's mutable
  collections; eval uses running averages.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# initialisers (reference slowfast/utils/weight_init_helper.py:10-54)

# c2_msra_fill: kaiming-normal, fan_out, relu gain
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def round_width(width, multiplier, min_width=1, divisor=1):
    """Reference slowfast/models/utils.py:11-24."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


@dataclasses.dataclass(frozen=True)
class NormSpec:
    """Normalisation config shared by every block (cfg.BN.*)."""

    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: running = (1-m)*running + m*new
    zero_init_final: bool = True  # RESNET.ZERO_INIT_FINAL_BN
    num_splits: int = 1  # >1 => SubBatchNorm (BN.NORM_TYPE sub_batchnorm)
    # MODEL.FROZEN_BN: BN runs in eval mode (running stats, no updates)
    # even while the rest of the model trains (reference
    # misc.frozen_bn_stats, tools/train_net.py:74-75)
    frozen: bool = False


class BatchNorm(nn.Module):
    """BN over (B, T, H, W) per channel; optional sub-batch splits.

    ``num_splits > 1`` replicates SubBatchNorm3d (reference
    batchnorm_helper.py:40-112): training stats are tracked per split of
    the batch; `aggregate_stats` folds them into the eval stats. The
    affine transform is shared across splits, matching the reference.
    """

    spec: NormSpec
    zero_init: bool = False
    num_splits: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.spec.frozen:
            train = False  # MODEL.FROZEN_BN: normalize with running stats
        c = x.shape[-1]
        k = self.num_splits
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_init else nn.initializers.ones,
            (c,),
        )
        bias = self.param("bias", nn.initializers.zeros, (c,))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if k > 1:
            split_mean = self.variable(
                "batch_stats", "split_mean", lambda: jnp.zeros((k, c), jnp.float32)
            )
            split_var = self.variable(
                "batch_stats", "split_var", lambda: jnp.ones((k, c), jnp.float32)
            )

        if train:
            xf = x.astype(jnp.float32)
            if k > 1:
                b = xf.shape[0]
                xs = xf.reshape((k, b // k) + xf.shape[1:])
                mean = xs.mean(axis=(1, 2, 3, 4))  # [k, c]
                var = xs.var(axis=(1, 2, 3, 4))
                if not self.is_initializing():
                    m = self.spec.momentum
                    split_mean.value = (1 - m) * split_mean.value + m * mean
                    split_var.value = (1 - m) * split_var.value + m * var
                mean = jnp.repeat(mean, b // k, axis=0)[:, None, None, None, :]
                var = jnp.repeat(var, b // k, axis=0)[:, None, None, None, :]
                y = (xf - mean) / jnp.sqrt(var + self.spec.eps)
            else:
                mean = xf.mean(axis=(0, 1, 2, 3))
                var = xf.var(axis=(0, 1, 2, 3))
                if not self.is_initializing():
                    m = self.spec.momentum
                    ra_mean.value = (1 - m) * ra_mean.value + m * mean
                    ra_var.value = (1 - m) * ra_var.value + m * var
                y = (xf - mean) / jnp.sqrt(var + self.spec.eps)
        else:
            y = (x.astype(jnp.float32) - ra_mean.value) / jnp.sqrt(
                ra_var.value + self.spec.eps
            )
        y = y * scale + bias
        return y.astype(x.dtype)


def aggregate_subbn_stats(batch_stats):
    """Fold per-split running stats into the eval stats for every
    SubBatchNorm in the tree (reference SubBatchNorm3d.aggregate_stats,
    batchnorm_helper.py:73-100). Returns a new batch_stats pytree."""

    def fix(d):
        if not isinstance(d, dict):
            return d
        if "split_mean" in d and "mean" in d:
            k = d["split_mean"].shape[0]
            mean = d["split_mean"].mean(axis=0)
            var = (
                d["split_var"].mean(axis=0)
                + ((d["split_mean"] - mean) ** 2).sum(axis=0) / k
            )
            return {**d, "mean": mean, "var": var}
        return {key: fix(v) for key, v in d.items()}

    return fix(batch_stats)


def conv3d(
    features: int,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int] = (1, 1, 1),
    padding: Optional[Tuple[int, int, int]] = None,
    dilation: Tuple[int, int, int] = (1, 1, 1),
    groups: int = 1,
    bias: bool = False,
    name: Optional[str] = None,
    kernel_init=msra_init,
) -> nn.Conv:
    """3-D conv on [B, T, H, W, C] with torch-style integer padding."""
    if padding is None:
        padding = tuple(k // 2 for k in kernel)
    return nn.Conv(
        features,
        kernel_size=kernel,
        strides=stride,
        padding=tuple((p, p) for p in padding),
        kernel_dilation=dilation,
        feature_group_count=groups,
        use_bias=bias,
        kernel_init=kernel_init,
        name=name,
    )


def max_pool3d(x, kernel, stride, padding=(0, 0, 0)):
    return nn.max_pool(
        x,
        window_shape=tuple(kernel),
        strides=tuple(stride),
        padding=tuple((p, p) for p in padding),
    )


def avg_pool3d(x, kernel, stride=(1, 1, 1)):
    return nn.avg_pool(x, window_shape=tuple(kernel), strides=tuple(stride))


class Swish(nn.Module):
    """x * sigmoid(x) (pytorchvideo.layers.swish used by X3D)."""

    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(x)


class SE(nn.Module):
    """Squeeze-and-Excitation (reference operators.py:17-63): global
    avg-pool, 1x1x1 fc + relu, 1x1x1 fc + sigmoid, channel re-scale."""

    dim_in: int
    ratio: float

    @staticmethod
    def _round_width(width, multiplier, min_width=8, divisor=8):
        if not multiplier:
            return width
        width *= multiplier
        min_width = min_width or divisor
        width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
        if width_out < 0.9 * width:
            width_out += divisor
        return int(width_out)

    @nn.compact
    def __call__(self, x):
        dim_fc = self._round_width(self.dim_in, self.ratio)
        s = x.mean(axis=(1, 2, 3), keepdims=True)
        s = conv3d(dim_fc, (1, 1, 1), bias=True, name="fc1")(s)
        s = nn.relu(s)
        s = conv3d(self.dim_in, (1, 1, 1), bias=True, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class Nonlocal(nn.Module):
    """Non-local block (reference nonlocal_helper.py:10-148).

    theta/phi/g 1x1x1 convs, affinity over all (T,H,W) positions
    (softmax or dot_product normalisation), output conv + BN, residual.
    Optional max-pool on phi/g to cut the affinity size.
    """

    dim: int
    dim_inner: int
    pool_size: Optional[Tuple[int, int, int]] = None
    instantiation: str = "softmax"
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        theta = conv3d(self.dim_inner, (1, 1, 1), bias=True, name="conv_theta")(x)
        xp = x
        use_pool = self.pool_size is not None and any(s > 1 for s in self.pool_size)
        if use_pool:
            xp = max_pool3d(x, self.pool_size, self.pool_size)
        phi = conv3d(self.dim_inner, (1, 1, 1), bias=True, name="conv_phi")(xp)
        g = conv3d(self.dim_inner, (1, 1, 1), bias=True, name="conv_g")(xp)

        b = x.shape[0]
        tq = theta.reshape(b, -1, self.dim_inner)  # [B, THW, C]
        pk = phi.reshape(b, -1, self.dim_inner)
        gv = g.reshape(b, -1, self.dim_inner)

        aff = jnp.einsum("btc,bpc->btp", tq, pk)
        if self.instantiation == "softmax":
            aff = jax.nn.softmax(aff * (self.dim_inner ** -0.5), axis=2)
        elif self.instantiation == "dot_product":
            aff = aff / aff.shape[2]
        else:
            raise NotImplementedError(f"Unknown norm type {self.instantiation}")
        out = jnp.einsum("btp,bpc->btc", aff, gv)
        out = out.reshape(x.shape[:-1] + (self.dim_inner,))
        out = conv3d(self.dim, (1, 1, 1), bias=True, name="conv_out")(out)
        # reference marks this bn transform_final_bn (zero_init_final_norm
        # default True), so it zero-inits whenever ZERO_INIT_FINAL_BN is on
        out = BatchNorm(
            self.norm, zero_init=self.norm.zero_init_final, name="bn"
        )(out, train=train)
        return identity + out


# ---------------------------------------------------------------------------
# transforms (reference resnet_helper.py)


class BasicTransform(nn.Module):
    """Tx3x3 + 1x3x3 (reference resnet_helper.py:29-119)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dilation: int = 1
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = self.temp_kernel_size
        x = conv3d(
            self.dim_out, (t, 3, 3), (1, self.stride, self.stride),
            (t // 2, 1, 1), name="a",
        )(x)
        x = BatchNorm(self.norm, name="a_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(
            self.dim_out, (1, 3, 3), (1, 1, 1), (0, self.dilation, self.dilation),
            dilation=(1, self.dilation, self.dilation), name="b",
        )(x)
        x = BatchNorm(
            self.norm, zero_init=self.norm.zero_init_final, name="b_bn"
        )(x, train=train)
        return x


class BottleneckTransform(nn.Module):
    """Tx1x1 + 1x3x3 + 1x1x1 (reference resnet_helper.py:261-398)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1x1, str3x3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        t = self.temp_kernel_size
        x = conv3d(
            self.dim_inner, (t, 1, 1), (1, str1x1, str1x1), (t // 2, 0, 0), name="a"
        )(x)
        x = BatchNorm(self.norm, name="a_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(
            self.dim_inner, (1, 3, 3), (1, str3x3, str3x3),
            (0, self.dilation, self.dilation),
            dilation=(1, self.dilation, self.dilation),
            groups=self.num_groups, name="b",
        )(x)
        x = BatchNorm(self.norm, name="b_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), name="c")(x)
        x = BatchNorm(
            self.norm, zero_init=self.norm.zero_init_final, name="c_bn"
        )(x, train=train)
        return x


class X3DTransform(nn.Module):
    """1x1x1 + Tx3x3 depthwise (+SE/Swish) + 1x1x1
    (reference resnet_helper.py:122-259)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    se_ratio: float = 0.0625
    swish_inner: bool = True
    block_idx: int = 0
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1x1, str3x3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        t = self.temp_kernel_size
        x = conv3d(self.dim_inner, (1, 1, 1), (1, str1x1, str1x1), name="a")(x)
        x = BatchNorm(self.norm, name="a_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(
            self.dim_inner, (t, 3, 3), (1, str3x3, str3x3),
            (t // 2, self.dilation, self.dilation),
            dilation=(1, self.dilation, self.dilation),
            groups=self.num_groups, name="b",
        )(x)
        x = BatchNorm(self.norm, name="b_bn")(x, train=train)
        # SE every other block: (block_idx + 1) % 2 truthy => SE on even idx
        if self.se_ratio > 0.0 and (self.block_idx + 1) % 2:
            x = SE(self.dim_inner, self.se_ratio, name="se")(x)
        x = Swish(name="b_swish")(x) if self.swish_inner else nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), name="c")(x)
        x = BatchNorm(
            self.norm, zero_init=self.norm.zero_init_final, name="c_bn"
        )(x, train=train)
        return x


TRANS_FUNCS = {
    "bottleneck_transform": BottleneckTransform,
    "basic_transform": BasicTransform,
    "x3d_transform": X3DTransform,
}


class ResBlock(nn.Module):
    """Residual block with optional projection shortcut
    (reference resnet_helper.py:399-524)."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    trans_func_name: str
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    block_idx: int = 0
    drop_connect_rate: float = 0.0
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        trans_cls = TRANS_FUNCS[self.trans_func_name]
        kwargs = dict(
            dim_out=self.dim_out,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            norm=self.norm,
        )
        if self.trans_func_name != "basic_transform":
            kwargs.update(
                dim_inner=self.dim_inner,
                num_groups=self.num_groups,
                stride_1x1=self.stride_1x1,
            )
        if self.trans_func_name == "x3d_transform":
            kwargs.update(block_idx=self.block_idx)
        f_x = trans_cls(name="branch2", **kwargs)(x, train=train)
        if train and self.drop_connect_rate > 0.0:
            keep = 1.0 - self.drop_connect_rate
            mask_shape = (f_x.shape[0],) + (1,) * (f_x.ndim - 1)
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, mask_shape
            )
            f_x = f_x * mask.astype(f_x.dtype) / keep
        if self.dim_in != self.dim_out or self.stride != 1:
            sc = conv3d(
                self.dim_out, (1, 1, 1), (1, self.stride, self.stride),
                name="branch1",
            )(x)
            sc = BatchNorm(self.norm, name="branch1_bn")(sc, train=train)
            x = sc + f_x
        else:
            x = x + f_x
        return nn.relu(x)


class ResStage(nn.Module):
    """One multi-pathway residual stage (reference resnet_helper.py:526-732).

    All per-pathway arguments are tuples of length num_pathways.
    """

    dim_in: Tuple[int, ...]
    dim_out: Tuple[int, ...]
    stride: Tuple[int, ...]
    temp_kernel_sizes: Tuple[Tuple[int, ...], ...]
    num_blocks: Tuple[int, ...]
    dim_inner: Tuple[int, ...]
    num_groups: Tuple[int, ...]
    num_block_temp_kernel: Tuple[int, ...]
    nonlocal_inds: Tuple[Tuple[int, ...], ...]
    nonlocal_group: Tuple[int, ...]
    nonlocal_pool: Tuple[Tuple[int, int, int], ...]
    dilation: Tuple[int, ...]
    instantiation: str = "softmax"
    trans_func_name: str = "bottleneck_transform"
    stride_1x1: bool = False
    drop_connect_rate: float = 0.0
    norm: NormSpec = NormSpec()

    def _block_temp_kernels(self, pathway: int):
        # repeat the basis across blocks, then pad with 1s past
        # num_block_temp_kernel (reference resnet_helper.py:613-616)
        n = self.num_blocks[pathway]
        k = self.num_block_temp_kernel[pathway]
        basis = list(self.temp_kernel_sizes[pathway])
        return (basis * n)[:k] + [1] * (n - k)

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        assert len(inputs) == len(self.num_blocks)
        output = []
        for pathway in range(len(self.num_blocks)):
            x = inputs[pathway]
            temp_kernels = self._block_temp_kernels(pathway)
            for i in range(self.num_blocks[pathway]):
                x = ResBlock(
                    dim_in=self.dim_in[pathway] if i == 0 else self.dim_out[pathway],
                    dim_out=self.dim_out[pathway],
                    temp_kernel_size=temp_kernels[i],
                    stride=self.stride[pathway] if i == 0 else 1,
                    trans_func_name=self.trans_func_name,
                    dim_inner=self.dim_inner[pathway],
                    num_groups=self.num_groups[pathway],
                    stride_1x1=self.stride_1x1,
                    dilation=self.dilation[pathway],
                    block_idx=i,
                    drop_connect_rate=self.drop_connect_rate,
                    norm=self.norm,
                    name=f"pathway{pathway}_res{i}",
                )(x, train=train)
                if i in self.nonlocal_inds[pathway]:
                    group = self.nonlocal_group[pathway]
                    b, t, h, w, c = x.shape
                    if group > 1:
                        # fold temporal groups into batch
                        x = x.reshape(b * group, t // group, h, w, c)
                    x = Nonlocal(
                        dim=self.dim_out[pathway],
                        dim_inner=self.dim_out[pathway] // 2,
                        pool_size=self.nonlocal_pool[pathway],
                        instantiation=self.instantiation,
                        norm=self.norm,
                        name=f"pathway{pathway}_nonlocal{i}",
                    )(x, train=train)
                    if group > 1:
                        x = x.reshape(b, t, h, w, c)
            output.append(x)
        return output


# ---------------------------------------------------------------------------
# stems (reference stem_helper.py)


class ResNetBasicStem(nn.Module):
    """Conv + BN + ReLU + 1x3x3/1x2x2 max-pool (stem_helper.py:128-206)."""

    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(self.dim_out, self.kernel, self.stride, self.padding, name="conv")(x)
        x = BatchNorm(self.norm, name="bn")(x, train=train)
        x = nn.relu(x)
        return max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))


class X3DStem(nn.Module):
    """Spatial conv then depthwise temporal conv (stem_helper.py:208-292)."""

    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(
            self.dim_out,
            (1, self.kernel[1], self.kernel[2]),
            (1, self.stride[1], self.stride[2]),
            (0, self.padding[1], self.padding[2]),
            name="conv_xy",
        )(x)
        x = conv3d(
            self.dim_out,
            (self.kernel[0], 1, 1),
            (self.stride[0], 1, 1),
            (self.padding[0], 0, 0),
            groups=self.dim_out,
            name="conv",
        )(x)
        x = BatchNorm(self.norm, name="bn")(x, train=train)
        return nn.relu(x)


class VideoModelStem(nn.Module):
    """Per-pathway stems (stem_helper.py:21-126)."""

    dim_out: Tuple[int, ...]
    kernel: Tuple[Tuple[int, int, int], ...]
    stride: Tuple[Tuple[int, int, int], ...]
    padding: Tuple[Tuple[int, int, int], ...]
    stem_func_name: str = "basic_stem"
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        assert len(xs) == len(self.dim_out)
        stem_cls = {"basic_stem": ResNetBasicStem, "x3d_stem": X3DStem}[
            self.stem_func_name
        ]
        return [
            stem_cls(
                self.dim_out[p], self.kernel[p], self.stride[p], self.padding[p],
                norm=self.norm, name=f"pathway{p}_stem",
            )(xs[p], train=train)
            for p in range(len(xs))
        ]


class FuseFastToSlow(nn.Module):
    """Fast->Slow lateral connection (video_model_builder.py:112-170)."""

    dim_in: int  # fast-pathway channels
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        x_s, x_f = xs
        fuse = conv3d(
            self.dim_in * self.fusion_conv_channel_ratio,
            (self.fusion_kernel, 1, 1),
            (self.alpha, 1, 1),
            (self.fusion_kernel // 2, 0, 0),
            name="conv_f2s",
        )(x_f)
        fuse = BatchNorm(self.norm, name="bn")(fuse, train=train)
        fuse = nn.relu(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


# ---------------------------------------------------------------------------
# heads (reference head_helper.py)


class MLPHead(nn.Module):
    """SSL projection/predictor MLP (reference head_helper.py:20-68):
    Linear -> [BN] -> ReLU -> ... -> Linear. Biases are dropped on
    BN-covered layers; the final Linear always honours ``bias``."""

    dim_out: int
    mlp_dim: int
    num_layers: int
    bn_on: bool = False
    bias: bool = True
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.bias if not self.bn_on else False
        x = nn.Dense(
            self.mlp_dim, use_bias=b, dtype=jnp.float32, name="fc0"
        )(x)
        for i in range(1, self.num_layers):
            if self.bn_on:
                x = BatchNorm(self.norm, name=f"bn{i}")(x, train=train)
            x = nn.relu(x)
            last = i == self.num_layers - 1
            x = nn.Dense(
                self.dim_out if last else self.mlp_dim,
                use_bias=self.bias if last else b,
                dtype=jnp.float32,
                name=f"fc{i}",
            )(x)
        return x


class ResNetBasicHead(nn.Module):
    """Per-pathway avg-pool, concat, dropout, linear projection; at eval
    the activation is applied and any remaining T,H,W extent averaged
    (head_helper.py:71-238). ``mlp_layers > 1`` swaps the projection
    for an SSL MLPHead and ``predictor_depths`` appends BYOL-style
    predictor MLPs — the head then returns [proj, *predictor_outs]."""

    num_classes: int
    pool_size: Optional[Tuple[Optional[Tuple[int, int, int]], ...]]  # None => global
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    detach_final_fc: bool = False
    fc_init_std: float = 0.01
    num_pathways: int = 1
    mlp_layers: int = 1
    mlp_dim: int = 2048
    mlp_bn: bool = False
    predictor_depths: Tuple[int, ...] = ()
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        pool_out = []
        for p in range(self.num_pathways):
            x = inputs[p]
            if self.pool_size is None or self.pool_size[p] is None:
                x = x.mean(axis=(1, 2, 3), keepdims=True)
            else:
                x = avg_pool3d(x, self.pool_size[p])
            pool_out.append(x)
        x = jnp.concatenate(pool_out, axis=-1)  # [B, t, h, w, C]
        if train and self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        if self.detach_final_fc:
            x = jax.lax.stop_gradient(x)
        if self.mlp_layers > 1:
            # contrastive path flattens a [B,1,1,1,C] map to 2-D first
            # (head_helper.py:202-206 ContrastiveModel quirk)
            if x.shape[1:4] == (1, 1, 1):
                x = x.reshape(x.shape[0], -1)
            x = MLPHead(
                self.num_classes, self.mlp_dim, self.mlp_layers,
                bn_on=self.mlp_bn, norm=self.norm, name="projection",
            )(x, train=train)
        else:
            x = nn.Dense(
                self.num_classes,
                kernel_init=nn.initializers.normal(self.fc_init_std),
                dtype=jnp.float32,
                name="projection",
            )(x)
        time_projs = [
            MLPHead(
                self.num_classes, self.mlp_dim, depth,
                bn_on=self.mlp_bn, norm=self.norm, name=f"predictors_{i}",
            )(x, train=train)
            for i, depth in enumerate(self.predictor_depths)
        ]
        if not train:
            if self.act_func == "softmax":
                x = jax.nn.softmax(x, axis=-1 if x.ndim == 2 else 4)
            elif self.act_func == "sigmoid":
                x = jax.nn.sigmoid(x)
            elif self.act_func != "none":
                raise NotImplementedError(
                    f"{self.act_func} is not supported as an activation function."
                )
            if x.ndim > 2:
                x = x.mean(axis=(1, 2, 3))
        x = x.reshape(x.shape[0], -1)
        if time_projs:
            return [x] + [t.reshape(t.shape[0], -1) for t in time_projs]
        return x


class X3DHead(nn.Module):
    """conv5 + BN + ReLU, avg-pool, lin5 conv, dropout, projection
    (head_helper.py:231-369)."""

    dim_inner: int
    dim_out: int
    num_classes: int
    pool_size: Optional[Tuple[int, int, int]]
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    bn_lin5_on: bool = False
    fc_init_std: float = 0.01
    norm: NormSpec = NormSpec()

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        assert len(inputs) == 1, "X3D head expects a single pathway"
        x = conv3d(self.dim_inner, (1, 1, 1), name="conv_5")(inputs[0])
        x = BatchNorm(self.norm, name="conv_5_bn")(x, train=train)
        x = nn.relu(x)
        if self.pool_size is None:
            x = x.mean(axis=(1, 2, 3), keepdims=True)
        else:
            x = avg_pool3d(x, self.pool_size)
        x = conv3d(self.dim_out, (1, 1, 1), name="lin_5")(x)
        if self.bn_lin5_on:
            x = BatchNorm(self.norm, name="lin_5_bn")(x, train=train)
        x = nn.relu(x)
        if train and self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(self.fc_init_std),
            dtype=jnp.float32,
            name="projection",
        )(x)
        if not train:
            if self.act_func == "softmax":
                x = jax.nn.softmax(x, axis=4)
            elif self.act_func == "sigmoid":
                x = jax.nn.sigmoid(x)
            else:
                raise NotImplementedError(
                    f"{self.act_func} is not supported as an activation function."
                )
            x = x.mean(axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)
