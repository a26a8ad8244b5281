"""Legacy PySlowFast model families — SlowFast, ResNet (C2D/I3D/Slow),
X3D — as native flax modules.

Functional parity target: slowfast/models/video_model_builder.py
(SlowFast:172-444, ResNet:446-662, X3D:663-808) and the arch tables
(_TEMPORAL_KERNEL_BASIS / _POOL1 / _MODEL_STAGE_DEPTH, :37-110).

Input is the framework's channels-last [B, T, H, W, C] video (or a
list of per-pathway tensors). A single tensor fed to SlowFast is packed
into [slow, fast] with the reference's `pack_pathway_output` math
(slowfast/datasets/utils.py:81-114).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtm.models.convnet import (
    FuseFastToSlow,
    NormSpec,
    ResNetBasicHead,
    ResStage,
    VideoModelStem,
    X3DHead,
    max_pool3d,
    round_width,
)

# reference video_model_builder.py:38
_MODEL_STAGE_DEPTH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# reference video_model_builder.py:41-98 (subset used by video configs)
_TEMPORAL_KERNEL_BASIS = {
    "2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "slow_c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow_i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow": [[[1]], [[1]], [[1]], [[3]], [[3]]],
    "slowfast": [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]],
    "x3d": [[[5]], [[3]], [[3]], [[3]], [[3]]],
}

_POOL1 = {
    "2d": [[1, 1, 1]],
    "c2d": [[2, 1, 1]],
    "slow_c2d": [[1, 1, 1]],
    "i3d": [[2, 1, 1]],
    "slow_i3d": [[1, 1, 1]],
    "slow": [[1, 1, 1]],
    "slowfast": [[1, 1, 1], [1, 1, 1]],
    "x3d": [[1, 1, 1]],
}


def _t(x):
    """Deep list->tuple (specs must be hashable for flax)."""
    if isinstance(x, (list, tuple)):
        return tuple(_t(v) for v in x)
    return x


def pack_pathway_output(frames: jax.Array, alpha: int) -> list:
    """[B, T, H, W, C] -> [slow, fast] (reference datasets/utils.py:81-114:
    fast = frames, slow = every T//(T//alpha) th frame via linspace)."""
    t = frames.shape[1]
    idx = jnp.linspace(0, t - 1, t // alpha).astype(jnp.int32)
    return [jnp.take(frames, idx, axis=1), frames]


@dataclasses.dataclass(frozen=True)
class ConvNetSpec:
    """Static arch parameters shared by SlowFast/ResNet
    (extracted from cfg at build time; see ``spec_from_cfg``)."""

    arch: str
    depth: int
    num_groups: int
    width_per_group: int
    trans_func: str
    stride_1x1: bool
    num_block_temp_kernel: Tuple
    spatial_strides: Tuple
    spatial_dilations: Tuple
    nonlocal_location: Tuple
    nonlocal_group: Tuple
    nonlocal_pool: Tuple
    nonlocal_instantiation: str
    num_classes: Union[int, Tuple[int, ...]]
    dropout_rate: float
    head_act: str
    detach_final_fc: bool
    fc_init_std: float
    num_frames: int
    crop_size: int
    # SlowFast-only
    alpha: int = 8
    beta_inv: int = 8
    fusion_conv_channel_ratio: int = 2
    fusion_kernel_sz: int = 7
    norm: NormSpec = NormSpec()
    dropconnect_rate: float = 0.0
    global_head_pool: bool = False  # MULTIGRID.SHORT_CYCLE => adaptive pool
    # AVA detection (DETECTION.*): ROI head instead of the basic head
    detection: bool = False
    roi_resolution: int = 7
    roi_scale_factor: int = 16
    roi_aligned: bool = True
    # SSL head (CONTRASTIVE.*, reference head_helper.py:134-182)
    mlp_layers: int = 1
    mlp_dim: int = 2048
    mlp_bn: bool = False
    predictor_depths: Tuple[int, ...] = ()


def spec_from_cfg(cfg) -> ConvNetSpec:
    return ConvNetSpec(
        arch=cfg.MODEL.ARCH,
        depth=cfg.RESNET.DEPTH,
        num_groups=cfg.RESNET.NUM_GROUPS,
        width_per_group=cfg.RESNET.WIDTH_PER_GROUP,
        trans_func=cfg.RESNET.TRANS_FUNC,
        stride_1x1=cfg.RESNET.STRIDE_1X1,
        num_block_temp_kernel=_t(cfg.RESNET.NUM_BLOCK_TEMP_KERNEL),
        spatial_strides=_t(cfg.RESNET.SPATIAL_STRIDES),
        spatial_dilations=_t(cfg.RESNET.SPATIAL_DILATIONS),
        nonlocal_location=_t(cfg.NONLOCAL.LOCATION),
        nonlocal_group=_t(cfg.NONLOCAL.GROUP),
        nonlocal_pool=_t(cfg.NONLOCAL.POOL),
        nonlocal_instantiation=cfg.NONLOCAL.INSTANTIATION,
        num_classes=cfg.MODEL.NUM_CLASSES,
        dropout_rate=cfg.MODEL.DROPOUT_RATE,
        head_act=cfg.MODEL.HEAD_ACT,
        detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
        fc_init_std=cfg.MODEL.FC_INIT_STD,
        num_frames=cfg.DATA.NUM_FRAMES,
        crop_size=cfg.DATA.TRAIN_CROP_SIZE,
        alpha=cfg.SLOWFAST.ALPHA,
        beta_inv=cfg.SLOWFAST.BETA_INV,
        fusion_conv_channel_ratio=cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
        fusion_kernel_sz=cfg.SLOWFAST.FUSION_KERNEL_SZ,
        norm=NormSpec(
            zero_init_final=cfg.RESNET.ZERO_INIT_FINAL_BN,
            num_splits=(
                cfg.BN.NUM_SPLITS if cfg.BN.NORM_TYPE == "sub_batchnorm" else 1
            ),
            frozen=cfg.MODEL.FROZEN_BN,
        ),
        dropconnect_rate=cfg.MODEL.DROPCONNECT_RATE,
        global_head_pool=cfg.MULTIGRID.SHORT_CYCLE,
        detection=cfg.DETECTION.ENABLE,
        roi_resolution=cfg.DETECTION.ROI_XFORM_RESOLUTION,
        roi_scale_factor=cfg.DETECTION.SPATIAL_SCALE_FACTOR,
        roi_aligned=cfg.DETECTION.ALIGNED,
        mlp_layers=cfg.CONTRASTIVE.NUM_MLP_LAYERS,
        mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
        mlp_bn=cfg.CONTRASTIVE.BN_MLP,
        predictor_depths=_t(cfg.CONTRASTIVE.PREDICTOR_DEPTHS),
    )


def _as_pathway_list(x, num_pathways: int, alpha: int):
    if isinstance(x, (list, tuple)):
        assert len(x) == num_pathways
        return list(x)
    if num_pathways == 2:
        return pack_pathway_output(x, alpha)
    return [x]


class SlowFastModel(nn.Module):
    """Two-pathway SlowFast network (video_model_builder.py:172-444)."""

    spec: ConvNetSpec

    @nn.compact
    def __call__(self, x, state=None, rng=None, train: bool = False,
                 bboxes=None):
        s = self.spec
        pool_size = _POOL1[s.arch]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[s.depth]
        wpg = s.width_per_group
        dim_inner = s.num_groups * wpg
        out_dim_ratio = s.beta_inv // s.fusion_conv_channel_ratio
        tk = _TEMPORAL_KERNEL_BASIS[s.arch]
        norm = s.norm

        xs = _as_pathway_list(x, 2, s.alpha)

        xs = VideoModelStem(
            dim_out=(wpg, wpg // s.beta_inv),
            kernel=(tuple(tk[0][0]) + (7, 7), tuple(tk[0][1]) + (7, 7)),
            stride=((1, 2, 2),) * 2,
            padding=((tk[0][0][0] // 2, 3, 3), (tk[0][1][0] // 2, 3, 3)),
            norm=norm,
            name="s1",
        )(xs, train=train)
        xs = FuseFastToSlow(
            wpg // s.beta_inv, s.fusion_conv_channel_ratio, s.fusion_kernel_sz,
            s.alpha, norm=norm, name="s1_fuse",
        )(xs, train=train)

        stage_args = dict(
            instantiation=s.nonlocal_instantiation,
            trans_func_name=s.trans_func,
            stride_1x1=s.stride_1x1,
            norm=norm,
        )
        xs = ResStage(
            dim_in=(wpg + wpg // out_dim_ratio, wpg // s.beta_inv),
            dim_out=(wpg * 4, wpg * 4 // s.beta_inv),
            dim_inner=(dim_inner, dim_inner // s.beta_inv),
            temp_kernel_sizes=_t(tk[1]),
            stride=s.spatial_strides[0],
            num_blocks=(d2,) * 2,
            num_groups=(s.num_groups,) * 2,
            num_block_temp_kernel=s.num_block_temp_kernel[0],
            nonlocal_inds=s.nonlocal_location[0],
            nonlocal_group=s.nonlocal_group[0],
            nonlocal_pool=s.nonlocal_pool[0],
            dilation=s.spatial_dilations[0],
            name="s2",
            **stage_args,
        )(xs, train=train)
        xs = FuseFastToSlow(
            wpg * 4 // s.beta_inv, s.fusion_conv_channel_ratio,
            s.fusion_kernel_sz, s.alpha, norm=norm, name="s2_fuse",
        )(xs, train=train)
        xs = [
            max_pool3d(xp, pool_size[p], pool_size[p])
            for p, xp in enumerate(xs)
        ]
        xs = ResStage(
            dim_in=(wpg * 4 + wpg * 4 // out_dim_ratio, wpg * 4 // s.beta_inv),
            dim_out=(wpg * 8, wpg * 8 // s.beta_inv),
            dim_inner=(dim_inner * 2, dim_inner * 2 // s.beta_inv),
            temp_kernel_sizes=_t(tk[2]),
            stride=s.spatial_strides[1],
            num_blocks=(d3,) * 2,
            num_groups=(s.num_groups,) * 2,
            num_block_temp_kernel=s.num_block_temp_kernel[1],
            nonlocal_inds=s.nonlocal_location[1],
            nonlocal_group=s.nonlocal_group[1],
            nonlocal_pool=s.nonlocal_pool[1],
            dilation=s.spatial_dilations[1],
            name="s3",
            **stage_args,
        )(xs, train=train)
        xs = FuseFastToSlow(
            wpg * 8 // s.beta_inv, s.fusion_conv_channel_ratio,
            s.fusion_kernel_sz, s.alpha, norm=norm, name="s3_fuse",
        )(xs, train=train)
        xs = ResStage(
            dim_in=(wpg * 8 + wpg * 8 // out_dim_ratio, wpg * 8 // s.beta_inv),
            dim_out=(wpg * 16, wpg * 16 // s.beta_inv),
            dim_inner=(dim_inner * 4, dim_inner * 4 // s.beta_inv),
            temp_kernel_sizes=_t(tk[3]),
            stride=s.spatial_strides[2],
            num_blocks=(d4,) * 2,
            num_groups=(s.num_groups,) * 2,
            num_block_temp_kernel=s.num_block_temp_kernel[2],
            nonlocal_inds=s.nonlocal_location[2],
            nonlocal_group=s.nonlocal_group[2],
            nonlocal_pool=s.nonlocal_pool[2],
            dilation=s.spatial_dilations[2],
            name="s4",
            **stage_args,
        )(xs, train=train)
        xs = FuseFastToSlow(
            wpg * 16 // s.beta_inv, s.fusion_conv_channel_ratio,
            s.fusion_kernel_sz, s.alpha, norm=norm, name="s4_fuse",
        )(xs, train=train)
        xs = ResStage(
            dim_in=(wpg * 16 + wpg * 16 // out_dim_ratio, wpg * 16 // s.beta_inv),
            dim_out=(wpg * 32, wpg * 32 // s.beta_inv),
            dim_inner=(dim_inner * 8, dim_inner * 8 // s.beta_inv),
            temp_kernel_sizes=_t(tk[4]),
            stride=s.spatial_strides[3],
            num_blocks=(d5,) * 2,
            num_groups=(s.num_groups,) * 2,
            num_block_temp_kernel=s.num_block_temp_kernel[3],
            nonlocal_inds=s.nonlocal_location[3],
            nonlocal_group=s.nonlocal_group[3],
            nonlocal_pool=s.nonlocal_pool[3],
            dilation=s.spatial_dilations[3],
            name="s5",
            **stage_args,
        )(xs, train=train)

        if s.detection and bboxes is not None:
            from vtm.models.roi_head import ResNetRoIHead

            logits = ResNetRoIHead(
                num_classes=s.num_classes,
                resolution=(s.roi_resolution,) * 2,
                scale_factor=(s.roi_scale_factor,) * 2,
                dropout_rate=s.dropout_rate,
                act_func=s.head_act,
                aligned=s.roi_aligned,
                detach_final_fc=s.detach_final_fc,
                fc_init_std=s.fc_init_std,
                name="head",
            )(xs, bboxes, train=train)
            return logits, state
        if s.global_head_pool:
            head_pool = None
        else:
            head_pool = (
                (
                    s.num_frames // s.alpha // pool_size[0][0],
                    s.crop_size // 32 // pool_size[0][1],
                    s.crop_size // 32 // pool_size[0][2],
                ),
                (
                    s.num_frames // pool_size[1][0],
                    s.crop_size // 32 // pool_size[1][1],
                    s.crop_size // 32 // pool_size[1][2],
                ),
            )
        logits = ResNetBasicHead(
            num_classes=s.num_classes,
            pool_size=head_pool,
            dropout_rate=s.dropout_rate,
            act_func=s.head_act,
            detach_final_fc=s.detach_final_fc,
            fc_init_std=s.fc_init_std,
            num_pathways=2,
            mlp_layers=s.mlp_layers,
            mlp_dim=s.mlp_dim,
            mlp_bn=s.mlp_bn,
            predictor_depths=s.predictor_depths,
            norm=s.norm,
            name="head",
        )(xs, train=train)
        return logits, state


class ResNetModel(nn.Module):
    """Single-pathway C2D/I3D/Slow ResNet (video_model_builder.py:446-662)."""

    spec: ConvNetSpec

    @nn.compact
    def __call__(self, x, state=None, rng=None, train: bool = False,
                 bboxes=None):
        s = self.spec
        pool_size = _POOL1[s.arch]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[s.depth]
        wpg = s.width_per_group
        dim_inner = s.num_groups * wpg
        tk = _TEMPORAL_KERNEL_BASIS[s.arch]
        norm = s.norm

        xs = _as_pathway_list(x, 1, s.alpha)
        xs = VideoModelStem(
            dim_out=(wpg,),
            kernel=((tuple(tk[0][0]) + (7, 7)),),
            stride=((1, 2, 2),),
            padding=((tk[0][0][0] // 2, 3, 3),),
            norm=norm,
            name="s1",
        )(xs, train=train)

        stage_args = dict(
            instantiation=s.nonlocal_instantiation,
            trans_func_name=s.trans_func,
            stride_1x1=s.stride_1x1,
            norm=norm,
        )
        dims = [
            (wpg, wpg * 4, dim_inner, d2),
            (wpg * 4, wpg * 8, dim_inner * 2, d3),
            (wpg * 8, wpg * 16, dim_inner * 4, d4),
            (wpg * 16, wpg * 32, dim_inner * 8, d5),
        ]
        for i, (din, dout, dinner, nblocks) in enumerate(dims):
            xs = ResStage(
                dim_in=(din,),
                dim_out=(dout,),
                dim_inner=(dinner,),
                temp_kernel_sizes=_t(tk[i + 1]),
                stride=s.spatial_strides[i],
                num_blocks=(nblocks,),
                num_groups=(s.num_groups,),
                num_block_temp_kernel=s.num_block_temp_kernel[i],
                nonlocal_inds=s.nonlocal_location[i],
                nonlocal_group=s.nonlocal_group[i],
                nonlocal_pool=s.nonlocal_pool[i],
                dilation=s.spatial_dilations[i],
                name=f"s{i + 2}",
                **stage_args,
            )(xs, train=train)
            if i == 0:
                xs = [
                    max_pool3d(xp, pool_size[p], pool_size[p])
                    for p, xp in enumerate(xs)
                ]

        if s.detection and bboxes is not None:
            from vtm.models.roi_head import ResNetRoIHead

            logits = ResNetRoIHead(
                num_classes=s.num_classes,
                resolution=(s.roi_resolution,),
                scale_factor=(s.roi_scale_factor,),
                dropout_rate=s.dropout_rate,
                act_func=s.head_act,
                aligned=s.roi_aligned,
                detach_final_fc=s.detach_final_fc,
                fc_init_std=s.fc_init_std,
                name="head",
            )(xs, bboxes, train=train)
            return logits, state
        if s.global_head_pool:
            head_pool = None
        else:
            head_pool = (
                (
                    s.num_frames // pool_size[0][0],
                    s.crop_size // 32 // pool_size[0][1],
                    s.crop_size // 32 // pool_size[0][2],
                ),
            )
        logits = ResNetBasicHead(
            num_classes=s.num_classes,
            pool_size=head_pool,
            dropout_rate=s.dropout_rate,
            act_func=s.head_act,
            detach_final_fc=s.detach_final_fc,
            fc_init_std=s.fc_init_std,
            num_pathways=1,
            mlp_layers=s.mlp_layers,
            mlp_dim=s.mlp_dim,
            mlp_bn=s.mlp_bn,
            predictor_depths=s.predictor_depths,
            norm=s.norm,
            name="head",
        )(xs, train=train)
        return logits, state


@dataclasses.dataclass(frozen=True)
class X3DSpec:
    """X3D arch parameters (video_model_builder.py:663-808 + cfg.X3D)."""

    depth: int
    num_groups: int
    width_per_group: int
    trans_func: str
    stride_1x1: bool
    spatial_dilations: Tuple
    nonlocal_location: Tuple
    nonlocal_group: Tuple
    nonlocal_pool: Tuple
    nonlocal_instantiation: str
    num_classes: Union[int, Tuple[int, ...]]
    dropout_rate: float
    head_act: str
    fc_init_std: float
    num_frames: int
    crop_size: int
    width_factor: float
    depth_factor: float
    bottleneck_factor: float
    dim_c1: int
    dim_c5: int
    scale_res2: bool
    channelwise_3x3x3: bool
    bn_lin5: bool
    dropconnect_rate: float
    norm: NormSpec = NormSpec()


def x3d_spec_from_cfg(cfg) -> X3DSpec:
    return X3DSpec(
        depth=cfg.RESNET.DEPTH,
        num_groups=cfg.RESNET.NUM_GROUPS,
        width_per_group=cfg.RESNET.WIDTH_PER_GROUP,
        trans_func=cfg.RESNET.TRANS_FUNC,
        stride_1x1=cfg.RESNET.STRIDE_1X1,
        spatial_dilations=_t(cfg.RESNET.SPATIAL_DILATIONS),
        nonlocal_location=_t(cfg.NONLOCAL.LOCATION),
        nonlocal_group=_t(cfg.NONLOCAL.GROUP),
        nonlocal_pool=_t(cfg.NONLOCAL.POOL),
        nonlocal_instantiation=cfg.NONLOCAL.INSTANTIATION,
        num_classes=cfg.MODEL.NUM_CLASSES,
        dropout_rate=cfg.MODEL.DROPOUT_RATE,
        head_act=cfg.MODEL.HEAD_ACT,
        fc_init_std=cfg.MODEL.FC_INIT_STD,
        num_frames=cfg.DATA.NUM_FRAMES,
        crop_size=cfg.DATA.TRAIN_CROP_SIZE,
        width_factor=cfg.X3D.WIDTH_FACTOR,
        depth_factor=cfg.X3D.DEPTH_FACTOR,
        bottleneck_factor=cfg.X3D.BOTTLENECK_FACTOR,
        dim_c1=cfg.X3D.DIM_C1,
        dim_c5=cfg.X3D.DIM_C5,
        scale_res2=cfg.X3D.SCALE_RES2,
        channelwise_3x3x3=cfg.X3D.CHANNELWISE_3x3x3,
        bn_lin5=cfg.X3D.BN_LIN5,
        dropconnect_rate=cfg.MODEL.DROPCONNECT_RATE,
        norm=NormSpec(
            zero_init_final=cfg.RESNET.ZERO_INIT_FINAL_BN,
            num_splits=(
                cfg.BN.NUM_SPLITS if cfg.BN.NORM_TYPE == "sub_batchnorm" else 1
            ),
            frozen=cfg.MODEL.FROZEN_BN,
        ),
    )


class X3DModel(nn.Module):
    """X3D network (video_model_builder.py:663-808)."""

    spec: X3DSpec

    @nn.compact
    def __call__(self, x, state=None, rng=None, train: bool = False):
        s = self.spec
        tk = _TEMPORAL_KERNEL_BASIS["x3d"]
        norm = s.norm
        exp_stage = 2.0
        dim_res2 = (
            round_width(s.dim_c1, exp_stage, divisor=8)
            if s.scale_res2
            else s.dim_c1
        )
        dim_res3 = round_width(dim_res2, exp_stage, divisor=8)
        dim_res4 = round_width(dim_res3, exp_stage, divisor=8)
        dim_res5 = round_width(dim_res4, exp_stage, divisor=8)
        block_basis = (
            (1, dim_res2, 2),
            (2, dim_res3, 2),
            (5, dim_res4, 2),
            (3, dim_res5, 2),
        )
        dim_res1 = round_width(s.dim_c1, s.width_factor)

        xs = _as_pathway_list(x, 1, 1)
        xs = VideoModelStem(
            dim_out=(dim_res1,),
            kernel=((tuple(tk[0][0]) + (3, 3)),),
            stride=((1, 2, 2),),
            padding=((tk[0][0][0] // 2, 1, 1),),
            stem_func_name="x3d_stem",
            norm=norm,
            name="s1",
        )(xs, train=train)

        dim_in = dim_res1
        dim_out = dim_in
        dim_inner = dim_in
        for stage, block in enumerate(block_basis):
            dim_out = round_width(block[1], s.width_factor)
            dim_inner = int(s.bottleneck_factor * dim_out)
            n_rep = (
                int(math.ceil(s.depth_factor * block[0]))
                if s.depth_factor
                else block[0]
            )
            xs = ResStage(
                dim_in=(dim_in,),
                dim_out=(dim_out,),
                dim_inner=(dim_inner,),
                temp_kernel_sizes=_t(tk[1]),
                stride=(block[2],),
                num_blocks=(n_rep,),
                num_groups=(dim_inner,) if s.channelwise_3x3x3 else (s.num_groups,),
                num_block_temp_kernel=(n_rep,),
                nonlocal_inds=s.nonlocal_location[0],
                nonlocal_group=s.nonlocal_group[0],
                nonlocal_pool=s.nonlocal_pool[0],
                dilation=s.spatial_dilations[stage],
                instantiation=s.nonlocal_instantiation,
                trans_func_name=s.trans_func,
                stride_1x1=s.stride_1x1,
                drop_connect_rate=s.dropconnect_rate
                * (stage + 2)
                / (len(block_basis) + 1),
                norm=norm,
                name=f"s{stage + 2}",
            )(xs, train=train)
            dim_in = dim_out

        spat_sz = int(math.ceil(s.crop_size / 32.0))
        logits = X3DHead(
            dim_inner=dim_inner,
            dim_out=s.dim_c5,
            num_classes=s.num_classes,
            pool_size=(s.num_frames, spat_sz, spat_sz),
            dropout_rate=s.dropout_rate,
            act_func=s.head_act,
            bn_lin5_on=s.bn_lin5,
            fc_init_std=s.fc_init_std,
            norm=norm,
            name="head",
        )(xs, train=train)
        return logits, state


# ---------------------------------------------------------------------------
# registry

from vtm.models.build import ModelBundle, register_model  # noqa: E402


@register_model("SlowFast")
def _build_slowfast_bundle(cfg) -> ModelBundle:
    from vtm.merge.policy import MergePolicy

    spec = spec_from_cfg(cfg)
    module = SlowFastModel(spec=spec)
    return ModelBundle(
        module=module, params=None, config=spec,
        policy=MergePolicy(), name="SlowFast",
    )


@register_model("ResNet")
def _build_resnet_bundle(cfg) -> ModelBundle:
    from vtm.merge.policy import MergePolicy

    spec = spec_from_cfg(cfg)
    module = ResNetModel(spec=spec)
    return ModelBundle(
        module=module, params=None, config=spec,
        policy=MergePolicy(), name="ResNet",
    )


@register_model("X3D")
def _build_x3d_bundle(cfg) -> ModelBundle:
    from vtm.merge.policy import MergePolicy

    spec = x3d_spec_from_cfg(cfg)
    module = X3DModel(spec=spec)
    return ModelBundle(
        module=module, params=None, config=spec,
        policy=MergePolicy(), name="X3D",
    )
