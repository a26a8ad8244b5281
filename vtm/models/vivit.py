"""ViViT (factorised-encoder variant used by the reference = HF VivitModel)
— TPU-native flax implementation.

Parity targets: HF transformers VivitModel (the reference wraps it:
slowfast/models/vivit_video_model_builder.py:12-61) and the ToMe patch
tome/patch/vivit.py (ToMeVivitLayer:17-47, ToMeVivitSelfAttention:86-130).

Architecture: tubelet Conv3d embed + CLS token + learnable positional
embeddings; pre-LN encoder blocks with separate q/k/v projections;
final layernorm; classifier (or verb/noun pair) over the CLS token.
Merging happens after the attention residual, before the MLP, with the
CLS token protected.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtm.merge.policy import MergePolicy, MergeState, reduce_tokens
from vtm.models.build import ModelBundle, compute_dtype, duplication_plan, make_policy, register_model
from vtm.models.common import (
    LayerNorm,
    TubeletEmbed,
    aggregate_metric,
    attention_core,
    merge_heads,
    proportional_attn_bias,
    split_heads,
)


@dataclasses.dataclass(frozen=True)
class ViViTConfig:
    image_size: int = 224
    num_frames: int = 32
    tubelet_size: Tuple[int, int, int] = (2, 16, 16)
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu_fast"
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    num_classes: Union[int, Tuple[int, int]] = 400

    @property
    def tokens(self) -> int:  # incl. CLS
        t, ph, pw = self.tubelet_size
        return (
            (self.num_frames // t)
            * (self.image_size // ph)
            * (self.image_size // pw)
            + 1
        )

    @property
    def multi_head(self) -> bool:
        return isinstance(self.num_classes, (tuple, list))

    @classmethod
    def from_json(cls, path: str, num_classes) -> "ViViTConfig":
        """Build from the reference's HF-style json configs
        (configs/vivit/*/*.json; see vivit_video_model_builder.py:15-17)."""
        with open(path) as f:
            d = json.load(f)
        return cls(
            image_size=d["video_size"][1],
            num_frames=d["video_size"][0],
            tubelet_size=tuple(d["tubelet_size"]),
            num_channels=d["num_channels"],
            hidden_size=d["hidden_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            intermediate_size=d["intermediate_size"],
            hidden_act=d["hidden_act"],
            layer_norm_eps=d["layer_norm_eps"],
            qkv_bias=d["qkv_bias"],
            num_classes=num_classes,
        )


class ViViTSelfAttention(nn.Module):
    """Separate q/k/v attention returning (context, metric)
    (parity: tome/patch/vivit.py:86-130)."""

    config: ViViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size=None, head_aggregation: str = "mean"):
        c = self.config
        h = c.num_attention_heads
        q = split_heads(nn.Dense(c.hidden_size, use_bias=c.qkv_bias, dtype=self.dtype, name="query")(x), h)
        k = split_heads(nn.Dense(c.hidden_size, use_bias=c.qkv_bias, dtype=self.dtype, name="key")(x), h)
        v = split_heads(nn.Dense(c.hidden_size, use_bias=c.qkv_bias, dtype=self.dtype, name="value")(x), h)
        scale = (c.hidden_size // h) ** -0.5
        ctx = attention_core(q, k, v, scale, proportional_attn_bias(size))
        return merge_heads(ctx), aggregate_metric(k, head_aggregation)


class ViViTLayer(nn.Module):
    """Pre-LN encoder block with token reduction after the attention
    residual (parity: tome/patch/vivit.py:17-47)."""

    config: ViViTConfig
    policy: MergePolicy
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, state: MergeState, layer: int, metric_only: bool = False):
        c = self.config
        normed = LayerNorm(epsilon=c.layer_norm_eps, name="layernorm_before")(x)
        ctx, metric = ViViTSelfAttention(c, dtype=self.dtype, name="attention")(
            normed, state.attn_size(self.policy.prop_attn), self.policy.head_aggregation
        )
        if metric_only:
            # reference ToMeDuplicateVivitLayer (tome/patch/vivit.py:50-66)
            return reduce_tokens(self.policy, layer, metric, x, state)
        attn_out = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output")(ctx)
        x = x + attn_out

        x, state = reduce_tokens(self.policy, layer, metric, x, state)

        y = LayerNorm(epsilon=c.layer_norm_eps, name="layernorm_after")(x)
        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(y)
        if c.hidden_act not in ("gelu", "gelu_fast", "gelu_new", "gelu_pytorch_tanh"):
            # a silent exact-gelu fallback breaks parity with no diagnostic
            raise NotImplementedError(f"hidden_act {c.hidden_act!r}")
        y = nn.gelu(y, approximate=c.hidden_act in ("gelu_fast", "gelu_new", "gelu_pytorch_tanh"))
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(y)
        return x + y, state


class ViViT(nn.Module):
    """Full ViViT classifier. Input: [B, T, H, W, C] channels-last."""

    config: ViViTConfig
    policy: MergePolicy = MergePolicy()
    dtype: jnp.dtype = jnp.float32
    layer_schedule: Optional[Tuple[Tuple[int, bool], ...]] = None

    @nn.compact
    def __call__(self, x, state: Optional[MergeState] = None, rng: Optional[jax.Array] = None):
        c = self.config
        if state is None:
            state = MergeState(rng=rng)
        b = x.shape[0]
        if c.tubelet_size[1] == c.tubelet_size[2]:
            # conv3d semantics via the fast 2-D path (square spatial patch)
            x = TubeletEmbed(
                c.hidden_size,
                tubelet=c.tubelet_size[0],
                patch=c.tubelet_size[1],
                dtype=self.dtype,
                name="patch_embed",
            )(x)
        else:
            x = nn.Conv(
                c.hidden_size,
                kernel_size=c.tubelet_size,
                strides=c.tubelet_size,
                padding="VALID",
                dtype=self.dtype,
                name="patch_embed",
            )(x.astype(self.dtype))
            x = x.reshape(b, -1, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.hidden_size)), x], axis=1)
        pos = self.param("position_embeddings", nn.initializers.zeros, (1, c.tokens, c.hidden_size))
        x = x + pos.astype(x.dtype)

        schedule = self.layer_schedule or tuple((i, False) for i in range(c.num_hidden_layers))
        blocks = {}
        for step, (layer_idx, metric_only) in enumerate(schedule):
            if layer_idx not in blocks:
                blocks[layer_idx] = ViViTLayer(c, self.policy, dtype=self.dtype, name=f"layer_{layer_idx}")
            x, state = blocks[layer_idx](x, state, layer=step, metric_only=metric_only)

        x = LayerNorm(epsilon=c.layer_norm_eps, name="layernorm")(x)
        feats = x[:, 0]
        if c.multi_head:
            logits = tuple(
                nn.Dense(n, dtype=jnp.float32, name=name)(feats)
                for name, n in zip(("verb_classifier", "noun_classifier"), c.num_classes)
            )
        else:
            logits = nn.Dense(c.num_classes, dtype=jnp.float32, name="classifier")(feats)
        return logits, state


@register_model("ViViT")
def _build_vivit(cfg) -> ModelBundle:
    num_classes = (
        cfg.MODEL.NUM_CLASSES
        if cfg.EPICKITCHENS.NUM_CLASSES is None
        else tuple(cfg.EPICKITCHENS.NUM_CLASSES)
    )
    config = ViViTConfig.from_json(cfg.VIVIT.CONFIG_PATH, num_classes)
    policy = make_policy(cfg, config.num_hidden_layers, n_protected_class_token=True)
    plan = duplication_plan(cfg, config.num_hidden_layers)
    module = ViViT(
        config=config, policy=policy, dtype=compute_dtype(cfg), layer_schedule=plan
    )
    return ModelBundle(module=module, params=None, config=config, policy=policy, name="ViViT")
