"""TimeSformer — divided space-time attention ViT, TPU-native.

Parity targets: slowfast/models/timesformer.py (Block:89-153,
VisionTransformer:178-319, wrapper:332-350) and tome/patch/timesformer.py
(ToMeBlock:12-57, ToMeAttention:60-83, per-frame reduction fns:85-167).

Token layout matches the reference: sequence = [CLS, body] where the
body is ordered ``(p t)`` — spatial-major, time-minor. Each block runs
temporal attention over ``(b p) t``, spatial attention over
``(b t) p`` with the CLS token broadcast per frame and its outputs
frame-averaged, then merges tokens **per frame** ``(b t) p`` with the
spatial-attention keys as the metric (CLS excluded; proportional
attention applied only to the non-CLS block of the spatial logits).
The per-frame spatial token count P shrinks by r each layer (static).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtm.merge.policy import MergePolicy, MergeState, reduce_tokens
from vtm.models.build import ModelBundle, compute_dtype, duplication_plan, make_policy, register_model
from vtm.models.common import (
    proportional_attn_bias,
    LayerNorm,
    Mlp,
    attention_core,
    merge_heads,
    split_heads,
)


@dataclasses.dataclass(frozen=True)
class TimeSformerConfig:
    img_size: int = 224
    patch_size: int = 16
    num_classes: Union[int, Tuple[int, int]] = 400
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_frames: int = 8
    attention_type: str = "divided_space_time"
    layer_norm_eps: float = 1e-6

    @property
    def spatial_tokens(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def multi_head(self) -> bool:
        return isinstance(self.num_classes, (tuple, list))


def _fold_time(body: jnp.ndarray, b: int, t: int) -> jnp.ndarray:
    """[B, P*T, D] ('(p t)' order) -> [(B*P), T, D]."""
    p = body.shape[1] // t
    return body.reshape(b, p, t, -1).reshape(b * p, t, -1)


def _unfold_time(x: jnp.ndarray, b: int, t: int) -> jnp.ndarray:
    """[(B*P), T, D] -> [B, P*T, D]."""
    d = x.shape[-1]
    return x.reshape(b, -1, t, d).reshape(b, -1, d)


def _fold_space(body: jnp.ndarray, b: int, t: int) -> jnp.ndarray:
    """[B, P*T, D] -> [(B*T), P, D]."""
    d = body.shape[-1]
    p = body.shape[1] // t
    return body.reshape(b, p, t, d).transpose(0, 2, 1, 3).reshape(b * t, p, d)


def _unfold_space(x: jnp.ndarray, b: int, t: int) -> jnp.ndarray:
    """[(B*T), P, D] -> [B, P*T, D]."""
    d = x.shape[-1]
    p = x.shape[1]
    return x.reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b, p * t, d)


class TimeSformerAttention(nn.Module):
    """Fused-qkv attention. When ``size`` is given, adds log(size) to
    the non-CLS block of the logits and returns the CLS-stripped
    per-head-mean keys as metric (reference tome/patch/timesformer.py:60-83)."""

    dim: int
    num_heads: int
    qkv_bias: bool
    dtype: jnp.dtype = jnp.float32
    with_metric: bool = True

    @nn.compact
    def __call__(self, x, size=None):
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(z, self.num_heads) for z in (q, k, v))
        scale = (self.dim // self.num_heads) ** -0.5
        size_bias = proportional_attn_bias(size)
        out = attention_core(
            q, k, v, scale, size_bias, bias_excludes_first=size_bias is not None
        )
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(merge_heads(out))
        if not self.with_metric:
            return out
        return out, k.mean(axis=1)[:, 1:, :]


class TimeSformerBlock(nn.Module):
    config: TimeSformerConfig
    policy: MergePolicy
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, state: MergeState, layer: int, b: int, t: int):
        c = self.config
        if c.attention_type in ("space_only", "joint_space_time"):
            att = TimeSformerAttention(
                c.embed_dim, c.num_heads, c.qkv_bias, dtype=self.dtype,
                with_metric=False, name="attn",
            )(LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x))
            x = x + att
            x = x + Mlp(
                int(c.embed_dim * c.mlp_ratio), c.embed_dim, dtype=self.dtype, name="mlp"
            )(LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x))
            return x, state

        # ---- temporal attention over (b p) t (reference Block:124-129)
        body = x[:, 1:, :]
        xt = _fold_time(body, b, t)
        res_t = TimeSformerAttention(
            c.embed_dim, c.num_heads, c.qkv_bias, dtype=self.dtype,
            with_metric=False, name="temporal_attn",
        )(LayerNorm(epsilon=c.layer_norm_eps, name="temporal_norm1")(xt))
        res_t = _unfold_time(res_t, b, t)
        res_t = nn.Dense(c.embed_dim, dtype=self.dtype, name="temporal_fc")(res_t)
        xt = body + res_t

        # ---- spatial attention over (b t) p with broadcast CLS
        init_cls = x[:, 0:1, :]  # [B, 1, D]
        cls_rep = jnp.repeat(init_cls, t, axis=0)  # [(B*T), 1, D] (b-major)
        xs = _fold_space(xt, b, t)
        xs = jnp.concatenate([cls_rep.reshape(b * t, 1, -1), xs], axis=1)
        attn_size = state.attn_size(self.policy.prop_attn)
        res_s, metric = TimeSformerAttention(
            c.embed_dim, c.num_heads, c.qkv_bias, dtype=self.dtype, name="attn"
        )(LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(xs), attn_size)

        cls_out = res_s[:, 0, :].reshape(b, t, -1).mean(axis=1, keepdims=True)
        res_sp = _unfold_space(res_s[:, 1:, :], b, t)

        x = jnp.concatenate([init_cls + cls_out, xt + res_sp], axis=1)

        # ---- per-frame token reduction (reference timesformer_merge:85-109)
        if self.policy.mode != "none" and self.policy.r_at(layer) > 0:
            cls, merged = x[:, 0:1, :], x[:, 1:, :]
            folded = _fold_space(merged, b, t)
            folded, state = reduce_tokens(self.policy, layer, metric, folded, state)
            x = jnp.concatenate([cls, _unfold_space(folded, b, t)], axis=1)

        x = x + Mlp(
            int(c.embed_dim * c.mlp_ratio), c.embed_dim, dtype=self.dtype, name="mlp"
        )(LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x))
        return x, state


class TimeSformer(nn.Module):
    """Input: [B, T, H, W, C] channels-last."""

    config: TimeSformerConfig
    policy: MergePolicy = MergePolicy()
    dtype: jnp.dtype = jnp.float32
    layer_schedule: Optional[Tuple[int, ...]] = None  # block indices to run

    @nn.compact
    def __call__(self, x, state: Optional[MergeState] = None, rng: Optional[jax.Array] = None):
        c = self.config
        if state is None:
            state = MergeState(rng=rng)
        bsz, t = x.shape[0], x.shape[1]
        x = x.astype(self.dtype)
        # per-frame patch embedding (reference PatchEmbed:155-175)
        frames = x.reshape(bsz * t, *x.shape[2:])
        emb = nn.Conv(
            c.embed_dim,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(frames)
        emb = emb.reshape(bsz * t, -1, c.embed_dim)  # [(b t), P, D]
        p = emb.shape[1]

        cls_param = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, c.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, c.spatial_tokens + 1, c.embed_dim),
        )
        assert p == c.spatial_tokens, (
            f"input spatial tokens {p} != model {c.spatial_tokens}; pos-embed "
            "interpolation is applied at checkpoint-conversion time"
        )
        emb = emb + pos[:, 1:, :].astype(emb.dtype)
        cls = (cls_param + pos[:, 0:1, :]).astype(emb.dtype)
        cls = jnp.broadcast_to(cls, (bsz, 1, c.embed_dim))

        if c.attention_type != "space_only":
            time_embed = self.param(
                "time_embed", nn.initializers.normal(0.02), (1, c.num_frames, c.embed_dim)
            )
            assert t == c.num_frames, "time-embed interpolation handled in converter"
            xt = emb.reshape(bsz, t, p, c.embed_dim).transpose(0, 2, 1, 3)
            xt = xt.reshape(bsz * p, t, c.embed_dim) + time_embed.astype(emb.dtype)
            body = xt.reshape(bsz, p * t, c.embed_dim)
            x = jnp.concatenate([cls, body], axis=1)
        else:
            x = jnp.concatenate(
                [jnp.broadcast_to(cls[:1], (bsz * t, 1, c.embed_dim)), emb], axis=1
            )

        schedule = self.layer_schedule or tuple(range(c.depth))
        blocks = {}
        for step, layer_idx in enumerate(schedule):
            if layer_idx not in blocks:
                blocks[layer_idx] = TimeSformerBlock(
                    c, self.policy, dtype=self.dtype, name=f"blocks_{layer_idx}"
                )
            x, state = blocks[layer_idx](x, state, layer=step, b=bsz, t=t)

        if c.attention_type == "space_only":
            x = x.reshape(bsz, t, *x.shape[1:]).mean(axis=1)

        x = LayerNorm(epsilon=c.layer_norm_eps, name="norm")(x)
        feats = x[:, 0]
        if c.multi_head:
            logits = tuple(
                nn.Dense(n, dtype=jnp.float32, name=f"head{i}")(feats)
                for i, n in enumerate(c.num_classes)
            )
        else:
            logits = nn.Dense(c.num_classes, dtype=jnp.float32, name="head")(feats)
        return logits, state


@register_model("TimeSformer")
def _build_timesformer(cfg) -> ModelBundle:
    num_classes = (
        cfg.MODEL.NUM_CLASSES
        if cfg.EPICKITCHENS.NUM_CLASSES is None
        else tuple(cfg.EPICKITCHENS.NUM_CLASSES)
    )
    config = TimeSformerConfig(
        img_size=cfg.DATA.TRAIN_CROP_SIZE,
        num_classes=num_classes,
        num_frames=cfg.DATA.NUM_FRAMES,
        attention_type=cfg.TIMESFORMER.ATTENTION_TYPE,
    )
    # class_token=False: merging runs on CLS-stripped per-frame tokens
    # (the CLS is detached before matching — reference timesformer.py:89)
    policy = make_policy(cfg, config.depth, n_protected_class_token=False)
    # full-block shared-weight duplication (reference timesformer.py:170-172)
    plan = duplication_plan(cfg, config.depth)
    schedule = tuple(idx for idx, _ in plan) if plan is not None else None
    module = TimeSformer(
        config=config, policy=policy, dtype=compute_dtype(cfg), layer_schedule=schedule
    )
    return ModelBundle(module=module, params=None, config=config, policy=policy, name="TimeSformer")
