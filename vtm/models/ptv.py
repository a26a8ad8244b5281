"""PTV model families: CSN and R(2+1)D, plus the PTV* registry names.

Functional parity target: /root/reference/slowfast/models/ptv_model_builder.py
(PTVCSN :150-232, PTVR2plus1D :235-333, PTVX3D :57-147, PTVMViT :336-410).

The reference builds these through pytorchvideo's factories
(``create_csn`` / ``create_r2plus1d``); pytorchvideo is not available in
this image, so the two families the reference offers *only* through PTV
— channel-separated networks (ir-CSN, Tran et al. 2019) and R(2+1)D
(Tran et al. 2018) — are implemented natively here with exactly the
architecture hyperparameters the reference passes to those factories
(stem/stage kernels, strides, group widths, head pool kernels: see the
line cites on each spec below). The PTV names that duplicate families
vtm already implements natively (PTVX3D / PTVSlowFast / PTVResNet /
PTVMViT) are registered as aliases of the native builders — pytorchvideo
checkpoints could not be imported either way, and the native models are
the TPU-correct implementations of those architectures.

TPU notes: channels-last [B, T, H, W, C]; the CSN depthwise 3x3x3 runs
as a feature-grouped conv (XLA lowers full-group convs to the dedicated
depthwise path); BN lives in the flax ``batch_stats`` collection like
every other conv family (global-batch stats under the mesh = sync BN).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from flax import linen as nn

from vtm.models.convnet import (
    BatchNorm,
    NormSpec,
    ResNetBasicHead,
    conv3d,
    max_pool3d,
)
from vtm.models.slowfast import _MODEL_STAGE_DEPTH

# CSN supports the deeper table entry the reference exposes
# (ptv_model_builder.py:191 passes RESNET.DEPTH straight through).
_STAGE_DEPTH = dict(_MODEL_STAGE_DEPTH)
_STAGE_DEPTH[152] = (3, 8, 36, 3)


@dataclasses.dataclass(frozen=True)
class PTVSpec:
    """Shared arch parameters for the two PTV conv families."""

    depth: int
    width_per_group: int
    num_classes: int
    dropout_rate: float
    head_act: str
    num_frames: int
    crop_size: int
    norm: NormSpec


def ptv_spec_from_cfg(cfg) -> PTVSpec:
    return PTVSpec(
        depth=cfg.RESNET.DEPTH,
        width_per_group=cfg.RESNET.WIDTH_PER_GROUP,
        num_classes=cfg.MODEL.NUM_CLASSES,
        dropout_rate=cfg.MODEL.DROPOUT_RATE,
        head_act=cfg.MODEL.HEAD_ACT,
        num_frames=cfg.DATA.NUM_FRAMES,
        crop_size=cfg.DATA.TRAIN_CROP_SIZE,
        norm=NormSpec(
            zero_init_final=cfg.RESNET.ZERO_INIT_FINAL_BN,
            num_splits=(
                cfg.BN.NUM_SPLITS if cfg.BN.NORM_TYPE == "sub_batchnorm" else 1
            ),
            frozen=cfg.MODEL.FROZEN_BN,
        ),
    )


class _PTVBottleneck(nn.Module):
    """pytorchvideo-style bottleneck: 1x1x1 -> conv_b -> 1x1x1, each
    followed by BN, ReLU after the first two; the stride rides conv_b.

    ``style``:
      * ``csn``      — conv_b is a channel-separated (depthwise) 3x3x3
                       (stage_conv_b_width_per_group=1,
                       ptv_model_builder.py:207).
      * ``r2plus1d`` — conv_b is factorised into a 1x3x3 spatial conv
                       (stride 1,s,s) -> BN -> ReLU -> 3x1x1 temporal
                       conv (stride t,1,1) with inner width = dim_inner
                       (create_2plus1d_bottleneck_block,
                       ptv_model_builder.py:292-311).
    """

    dim_inner: int
    dim_out: int
    stride: Tuple[int, int]  # (temporal, spatial)
    style: str
    norm: NormSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, s = self.stride
        h = conv3d(self.dim_inner, (1, 1, 1), name="conv_a")(x)
        h = BatchNorm(self.norm, num_splits=self.norm.num_splits, name="conv_a_bn")(h, train=train)
        h = nn.relu(h)
        if self.style == "csn":
            h = conv3d(
                self.dim_inner, (3, 3, 3), stride=(t, s, s),
                groups=self.dim_inner, name="conv_b",
            )(h)
        elif self.style == "r2plus1d":
            h = conv3d(
                self.dim_inner, (1, 3, 3), stride=(1, s, s), name="conv_b_xy"
            )(h)
            h = BatchNorm(self.norm, num_splits=self.norm.num_splits, name="conv_b_xy_bn")(h, train=train)
            h = nn.relu(h)
            h = conv3d(
                self.dim_inner, (3, 1, 1), stride=(t, 1, 1), name="conv_b_t"
            )(h)
        else:  # pragma: no cover
            raise ValueError(self.style)
        h = BatchNorm(self.norm, num_splits=self.norm.num_splits, name="conv_b_bn")(h, train=train)
        h = nn.relu(h)
        h = conv3d(self.dim_out, (1, 1, 1), name="conv_c")(h)
        h = BatchNorm(
            self.norm,
            zero_init=self.norm.zero_init_final,
            num_splits=self.norm.num_splits,
            name="conv_c_bn",
        )(h, train=train)
        return h


class _PTVResBlock(nn.Module):
    """Residual block: projection shortcut when dims or stride change."""

    dim_inner: int
    dim_out: int
    stride: Tuple[int, int]
    style: str
    norm: NormSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, s = self.stride
        needs_proj = x.shape[-1] != self.dim_out or t != 1 or s != 1
        if needs_proj:
            sc = conv3d(
                self.dim_out, (1, 1, 1), stride=(t, s, s), name="branch1"
            )(x)
            sc = BatchNorm(self.norm, num_splits=self.norm.num_splits, name="branch1_bn")(sc, train=train)
        else:
            sc = x
        h = _PTVBottleneck(
            dim_inner=self.dim_inner,
            dim_out=self.dim_out,
            stride=self.stride,
            style=self.style,
            norm=self.norm,
                        name="branch2",
        )(x, train=train)
        return nn.relu(sc + h)


class _PTVStage(nn.Module):
    """``num_blocks`` residual blocks; block 0 carries the stride."""

    num_blocks: int
    dim_inner: int
    dim_out: int
    stride: Tuple[int, int]
    style: str
    norm: NormSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = _PTVResBlock(
                dim_inner=self.dim_inner,
                dim_out=self.dim_out,
                stride=self.stride if i == 0 else (1, 1),
                style=self.style,
                norm=self.norm,
                                name=f"res_{i}",
            )(x, train=train)
        return x


def _single_pathway(x):
    return x[0] if isinstance(x, (list, tuple)) else x


class CSNModel(nn.Module):
    """ir-CSN: ResNet bottlenecks with depthwise 3x3x3 conv_b
    (ptv_model_builder.py:173-220 factory arguments)."""

    spec: PTVSpec

    @nn.compact
    def __call__(self, x, state=None, rng=None, train: bool = False,
                 bboxes=None):
        s = self.spec
        depths = _STAGE_DEPTH[s.depth]
        w = s.width_per_group
        x = _single_pathway(x)

        # stem: conv (3,7,7)/(1,2,2) -> BN -> ReLU -> maxpool (1,3,3)/(1,2,2)
        x = conv3d(w, (3, 7, 7), stride=(1, 2, 2), name="stem_conv")(x)
        x = BatchNorm(s.norm, num_splits=s.norm.num_splits, name="stem_bn")(x, train=train)
        x = nn.relu(x)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), padding=(0, 1, 1))

        # stages: spatial stride (1,2,2,2), temporal stride (1,2,2,2)
        for i, nblocks in enumerate(depths):
            x = _PTVStage(
                num_blocks=nblocks,
                dim_inner=w * 2**i,
                dim_out=w * 4 * 2**i,
                stride=(1, 1) if i == 0 else (2, 2),
                style="csn",
                norm=s.norm,
                                name=f"s{i + 2}",
            )(x, train=train)

        logits = ResNetBasicHead(
            num_classes=s.num_classes,
            pool_size=((s.num_frames // 8, s.crop_size // 32, s.crop_size // 32),),
            dropout_rate=s.dropout_rate,
            act_func=s.head_act,
            num_pathways=1,
            norm=s.norm,
            name="head",
        )([x], train=train)
        return logits, state


class R2Plus1DModel(nn.Module):
    """R(2+1)D: factorised space-time bottlenecks
    (ptv_model_builder.py:258-322 factory arguments)."""

    spec: PTVSpec

    @nn.compact
    def __call__(self, x, state=None, rng=None, train: bool = False,
                 bboxes=None):
        s = self.spec
        depths = _STAGE_DEPTH[s.depth]
        w = s.width_per_group
        x = _single_pathway(x)

        # stem: conv (1,7,7)/(1,2,2) -> BN -> ReLU (no pool)
        x = conv3d(w, (1, 7, 7), stride=(1, 2, 2), name="stem_conv")(x)
        x = BatchNorm(s.norm, num_splits=s.norm.num_splits, name="stem_bn")(x, train=train)
        x = nn.relu(x)

        # stages: spatial stride (2,2,2,2), temporal stride (1,1,2,2)
        temporal = (1, 1, 2, 2)
        for i, nblocks in enumerate(depths):
            x = _PTVStage(
                num_blocks=nblocks,
                dim_inner=w * 2**i,
                dim_out=w * 4 * 2**i,
                stride=(temporal[i], 2),
                style="r2plus1d",
                norm=s.norm,
                                name=f"s{i + 2}",
            )(x, train=train)

        logits = ResNetBasicHead(
            num_classes=s.num_classes,
            pool_size=((s.num_frames // 4, s.crop_size // 32, s.crop_size // 32),),
            dropout_rate=s.dropout_rate,
            act_func=s.head_act,
            num_pathways=1,
            norm=s.norm,
            name="head",
        )([x], train=train)
        return logits, state


# ---------------------------------------------------------------------------
# registry

from vtm.models.build import ModelBundle, register_model  # noqa: E402


@register_model("PTVCSN")
def _build_csn_bundle(cfg) -> ModelBundle:
    from vtm.merge.policy import MergePolicy

    if cfg.DETECTION.ENABLE:
        raise NotImplementedError(
            "Detection model is not supported for PTVCSN yet."
        )  # matches ptv_model_builder.py:168-170
    spec = ptv_spec_from_cfg(cfg)
    return ModelBundle(
        module=CSNModel(spec=spec), params=None, config=spec,
        policy=MergePolicy(), name="PTVCSN",
    )


@register_model("PTVR2plus1D")
def _build_r2plus1d_bundle(cfg) -> ModelBundle:
    from vtm.merge.policy import MergePolicy

    if cfg.DETECTION.ENABLE:
        raise NotImplementedError(
            "Detection model is not supported for PTVR2plus1D yet."
        )  # matches ptv_model_builder.py:254-256
    spec = ptv_spec_from_cfg(cfg)
    return ModelBundle(
        module=R2Plus1DModel(spec=spec), params=None, config=spec,
        policy=MergePolicy(), name="PTVR2plus1D",
    )


def _alias(ptv_name: str, native_name: str):
    """PTV duplicates of natively-implemented families build the native
    model (documented delta: pytorchvideo factory internals are not
    replicated — pytorchvideo is absent from this image and its
    checkpoints cannot be imported regardless)."""

    @register_model(ptv_name)
    def _build(cfg) -> ModelBundle:
        from vtm.models.build import MODEL_REGISTRY

        bundle = MODEL_REGISTRY[native_name](cfg)
        return dataclasses.replace(bundle, name=ptv_name)

    return _build


_alias("PTVX3D", "X3D")          # ptv_model_builder.py:57-147
_alias("PTVSlowFast", "SlowFast")
_alias("PTVResNet", "ResNet")
_alias("PTVMViT", "MViT")        # ptv_model_builder.py:336-410
