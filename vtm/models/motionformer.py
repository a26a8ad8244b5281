"""Motionformer — trajectory-attention ViT, TPU-native.

Parity targets: slowfast/models/motionformer_video_model_builder.py
(Motionformer:25-283), motionformer_vit_helper.py (TrajectoryAttention:
146-267, JointSpaceTimeAttention:41-73, Block:286-318) and
tome/patch/motionformer.py (ToMeTrajectoryAttention:33-144,
per-frame reduction fns:147-227).

Layout notes (kept bit-compatible with the reference, quirks included):
  * the body sequence is FRAME-major ``(f n)`` — produced by the 3D
    patch embed and the separate pos-embed tiling
    (motionformer_video_model_builder.py:236-246);
  * trajectory attention treats keys as ``(f n)`` for the per-frame
    softmax (helper:242-247), **but** the ToMe patch folds the same
    sequence with the ``(s f)`` pattern for the matching metric, the
    per-"frame" merging, and the proportional-attention size vector
    (tome/patch/motionformer.py:109,143,151). We replicate that
    inconsistency exactly — it is what produced the paper's numbers;
  * ``use_original_code=True`` replicates the original v=x typo in the
    second (temporal) attention (helper:160-164,130-134);
  * at inference the head applies softmax (builder:275-282) — multi-view
    ensembling therefore sums probabilities for this model.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtm.merge.policy import MergePolicy, MergeState, reduce_tokens
from vtm.models.build import ModelBundle, compute_dtype, duplication_plan, make_policy, register_model
from vtm.models.common import LayerNorm, Mlp, _on_tpu, merge_heads, split_heads
from vtm.models.timesformer import _fold_space, _unfold_space


@dataclasses.dataclass(frozen=True)
class MotionformerConfig:
    img_size: int = 224
    patch_size: int = 16
    patch_size_temp: int = 2
    in_chans: int = 3
    num_classes: Union[int, Tuple[int, int]] = 400
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    temporal_resolution: int = 8  # frames AFTER temporal patching
    use_mlp: bool = False
    head_act: str = "tanh"
    pos_embed_type: str = "separate"  # separate | joint
    attn_layer: str = "trajectory"  # trajectory | joint | divided
    use_original_code: bool = True
    approx_attn_type: str = "none"
    approx_attn_dim: int = 128
    layer_norm_eps: float = 1e-6

    @property
    def spatial_tokens(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def multi_head(self) -> bool:
        return isinstance(self.num_classes, (tuple, list))


class _HalfKV(nn.Module):
    """proj_kv with the SAME parameter layout as nn.Dense(2*features)
    but contracting only the k half — the v half is dead under the
    reference's v=x trajectory typo (motionformer_vit_helper.py:160-164),
    and XLA doesn't fully eliminate the fused kv matmul on its own."""

    features: int  # k half width
    use_bias: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], 2 * self.features),
        )
        y = x @ kernel[:, : self.features].astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (2 * self.features,))
            y = y + bias[: self.features].astype(y.dtype)
        return y


class TrajectoryAttention(nn.Module):
    """Full-attention trajectory attention returning
    (out, metric or None). ``size`` is the per-pseudo-frame token size
    [(B*F), S, 1] (None disables proportional attention)."""

    config: MotionformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int, size=None, with_metric: bool = True, rng=None):
        c = self.config
        b, n, d = x.shape
        h = c.num_heads
        hd = d // h
        f = num_frames
        s = (n - 1) // f  # spatial tokens per frame
        scale = hd ** -0.5

        qkv = nn.Dense(d * 3, use_bias=c.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(z, h) for z in (q, k, v))  # [B, h, N, hd]

        # CLS attends over everything incl. itself (helper:176-179)
        cls_logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q[:, :, :1] * scale, k, preferred_element_type=jnp.float32
        )
        cls_attn = nn.softmax(cls_logits, axis=-1).astype(v.dtype)
        cls_out = jnp.einsum("bhqk,bhkd->bhqd", cls_attn, v)
        cls_out = merge_heads(cls_out)  # [B, 1, D]

        q_, k_, v_ = q[:, :, 1:], k[:, :, 1:], v[:, :, 1:]
        if c.approx_attn_type != "none":
            # approximate spatial attention (reference trajectory attn
            # branches, motionformer_vit_helper.py:186-233; size/ToMe
            # proportional bias applies to the full branch only)
            from vtm.models import motionformer_approx as approx

            q_f = q_.reshape(b * h, n - 1, hd)
            k_f = k_.reshape(b * h, n - 1, hd)
            v_f2 = v_.reshape(b * h, n - 1, hd)
            if c.approx_attn_type == "nystrom":
                xfa = approx.nystrom_spatial_attn(
                    q_f, k_f, v_f2,
                    landmarks=c.approx_attn_dim,
                    num_frames=f,
                    use_spatial_landmarks=True,
                )
            elif c.approx_attn_type == "orthoformer":
                xfa = approx.orthoformer(
                    q_f, k_f, v_f2,
                    num_landmarks=c.approx_attn_dim,
                    num_frames=f,
                    rng=rng,
                )
            elif c.approx_attn_type == "performer":
                xfa = approx.performer_attention(q_f, k_f, v_f2, f, m=256)
            else:
                raise ValueError(f"unknown approx_attn_type {c.approx_attn_type!r}")
            xfa = xfa.reshape(b, h, n - 1, f, hd).transpose(0, 2, 3, 1, 4)
        else:
            # spatial attention per actual frame (keys grouped (f n));
            # the proportional-attention size is (s f)-flattened while
            # the keys are (f n)-major — the reference patch's exact
            # inconsistency (tome/patch/motionformer.py:107-111)
            key_bias = None
            if size is not None:
                size_flat = _unfold_space(size, b, f)[:, :, 0]  # [B, N-1]
                key_bias = jnp.log(size_flat)
            if _on_tpu() and 256 <= n - 1 <= 4096:
                from vtm.ops.flash_attention import tome_frame_attention

                xfa = tome_frame_attention(q_, k_, v_, key_bias, scale, f)
            else:
                logits = jnp.einsum(
                    "bhqd,bhkd->bhqk", q_, k_, preferred_element_type=jnp.float32
                ) * scale
                if key_bias is not None:
                    logits = logits + key_bias[:, None, None, :].astype(jnp.float32)
                logits = logits.reshape(b, h, n - 1, f, s)
                attn = nn.softmax(logits, axis=-1).astype(v.dtype)
                v_f = v_.reshape(b, h, f, s, hd)
                xfa = jnp.einsum("bhqfn,bhfnd->bqfhd", attn, v_f)  # [B,N',F,h,hd]

        # trajectory (temporal) attention; query = own-frame diagonal.
        # xfa is token-major [B, N', F, h, hd] — head-merge for the
        # f-expanded proj_kv matmul is a free reshape, and the temporal
        # einsums below consume [B, N', F, ...] directly (the old layout
        # needed three ~154 MB 5-D transposes per layer at ViT-B).
        xq = xfa.reshape(b, n - 1, f, d)
        # token's own frame (body is (f n)); one-hot reduce beats
        # take_along_axis's gather lowering (measured -0.3 ms/layer)
        frame_onehot = jax.nn.one_hot(jnp.arange(n - 1) // s, f, dtype=xq.dtype)
        x_diag = jnp.einsum("nf,bnfd->bnd", frame_onehot, xq)
        q2 = nn.Dense(d, use_bias=c.qkv_bias, dtype=self.dtype, name="proj_q")(x_diag)
        if c.use_original_code:
            # v=x typo (helper:160-164): proj_kv's v half is never used —
            # contract only the k half explicitly (XLA doesn't fully DCE
            # the fused kv matmul; measured 0.34 ms/layer at ViT-B)
            k2 = _HalfKV(d, c.qkv_bias, dtype=self.dtype, name="proj_kv")(xq)
            v2 = None
        else:
            kv2 = nn.Dense(d * 2, use_bias=c.qkv_bias, dtype=self.dtype, name="proj_kv")(xq)
            k2, v2 = jnp.split(kv2, 2, axis=-1)
        # temporal attention via head-indicator matmuls: per-head logits
        # logits2[b,n,f,h] = sum_hd q2*k2 computed as an elementwise
        # product + a [D,h] 0/1 segment matmul, so every tensor stays in
        # the token-major [B,N',F,D] layout (the per-(b,n,h) batched
        # [1,hd]x[hd,f] einsum form made XLA transpose k2 and xfa —
        # ~1.1 ms/layer slower at ViT-B, tools/profile_motionformer.py)
        hmat = jnp.zeros((d, h), xq.dtype).at[jnp.arange(d), jnp.arange(d) // hd].set(1)
        z = (q2 * scale)[:, :, None, :] * k2  # [B, N', F, D]
        logits2 = jnp.einsum("bnfd,dh->bnfh", z, hmat, preferred_element_type=jnp.float32)
        attn2 = nn.softmax(logits2, axis=2)
        attn2_d = jnp.einsum("bnfh,dh->bnfd", attn2.astype(v.dtype), hmat)
        # use_original_code keeps the original v=x typo (helper:160-164):
        # the temporal values are the aggregated x, not proj_kv's v
        val2 = xq if c.use_original_code else v2
        out = jnp.sum(attn2_d * val2, axis=2)

        out = jnp.concatenate([cls_out, out], axis=1)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)

        if not with_metric:
            return out, None
        # metric: (s f) fold of the spatial keys, mean over heads
        # (tome/patch/motionformer.py:143-144)
        k_mean = k_.mean(axis=1)  # [B, N-1, hd]
        # reference folds per-head keys then means heads; fold is linear so
        # mean-then-fold == fold-then-mean
        metric = _fold_space(k_mean, b, f)  # [(B*F), S, hd]
        return out, metric


class JointAttention(nn.Module):
    config: MotionformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int, size=None, with_metric: bool = True, rng=None):
        c = self.config
        h = c.num_heads
        qkv = nn.Dense(x.shape[-1] * 3, use_bias=c.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = (split_heads(z, h) for z in jnp.split(qkv, 3, axis=-1))
        scale = (x.shape[-1] // h) ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
        attn = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = merge_heads(jnp.einsum("bhqk,bhkd->bhqd", attn, v))
        out = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj")(out)
        metric = None
        if with_metric:
            metric = _fold_space(k.mean(axis=1)[:, 1:], x.shape[0], num_frames)
        return out, metric


class DividedAttention(nn.Module):
    """Divided space-time attention with a globally-attending CLS token
    (reference motionformer_vit_helper.py:76-141): the CLS query attends
    over the FULL sequence; patch tokens attend within their frame
    (space) or their spatial position (time), with the CLS key/value
    prepended to every group. Body layout is '(f n)' frame-major with
    exact einops-equivalent folds (unlike the trajectory path's
    deliberate (s f) quirk)."""

    config: MotionformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int, to_time: bool):
        c = self.config
        h = c.num_heads
        dim = x.shape[-1]
        qkv = nn.Dense(dim * 3, use_bias=c.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = (split_heads(z, h) for z in jnp.split(qkv, 3, axis=-1))
        q = q * (dim // h) ** -0.5
        cls_q, q_ = q[:, :, :1], q[:, :, 1:]
        cls_k, k_ = k[:, :, :1], k[:, :, 1:]
        cls_v, v_ = v[:, :, :1], v[:, :, 1:]

        # CLS attends across all of time and space
        cls_logits = jnp.einsum(
            "bhqd,bhkd->bhqk", cls_q, k, preferred_element_type=jnp.float32
        )
        cls_out = jnp.einsum(
            "bhqk,bhkd->bhqd", nn.softmax(cls_logits, axis=-1).astype(v.dtype), v
        )

        b, _, n, d = q_.shape
        f = num_frames
        s = n // f

        def fold(t):
            t = t.reshape(b, h, f, s, d)  # '(f n)' frame-major groups
            return t.transpose(0, 1, 3, 2, 4) if to_time else t

        qf, kf, vf = fold(q_), fold(k_), fold(v_)
        g = qf.shape[2]
        kf = jnp.concatenate(
            [jnp.broadcast_to(cls_k[:, :, None], (b, h, g, 1, d)), kf], axis=3
        )
        vf = jnp.concatenate(
            [jnp.broadcast_to(cls_v[:, :, None], (b, h, g, 1, d)), vf], axis=3
        )
        logits = jnp.einsum(
            "bhgqd,bhgkd->bhgqk", qf, kf, preferred_element_type=jnp.float32
        )
        out = jnp.einsum(
            "bhgqk,bhgkd->bhgqd", nn.softmax(logits, axis=-1).astype(vf.dtype), vf
        )
        if to_time:
            out = out.transpose(0, 1, 3, 2, 4)
        out = out.reshape(b, h, n, d)
        out = jnp.concatenate([cls_out, out], axis=2)
        return nn.Dense(dim, dtype=self.dtype, name="proj")(merge_heads(out))


class MotionformerBlock(nn.Module):
    config: MotionformerConfig
    policy: MergePolicy
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, state: MergeState, layer: int, num_frames: int):
        c = self.config
        if c.attn_layer == "divided":
            # reference DividedSpaceTimeBlock (vit_helper.py:320-365):
            # time attention (norm3) then space attention (norm1), then
            # MLP. The ToMe patch never touches these blocks
            # (patch/motionformer.py:279 checks isinstance(…, Block)),
            # so the divided variant always runs unmerged — replicated.
            x = x + DividedAttention(c, dtype=self.dtype, name="timeattn")(
                LayerNorm(epsilon=c.layer_norm_eps, name="norm3")(x),
                num_frames,
                to_time=True,
            )
            x = x + DividedAttention(c, dtype=self.dtype, name="attn")(
                LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x),
                num_frames,
                to_time=False,
            )
            x = x + Mlp(
                int(c.embed_dim * c.mlp_ratio), c.embed_dim, dtype=self.dtype, name="mlp"
            )(LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x))
            return x, state
        attn_cls = {"trajectory": TrajectoryAttention, "joint": JointAttention}[
            c.attn_layer
        ]
        attn_size = state.attn_size(self.policy.prop_attn)
        # orthoformer's initial landmark is random in the reference
        # (orthoformer_helper.py:33); thread the forward key when given
        attn_rng = (
            state.next_rng() if c.approx_attn_type == "orthoformer" else None
        )
        out, metric = attn_cls(c, dtype=self.dtype, name="attn")(
            LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x),
            num_frames,
            attn_size,
            rng=attn_rng,
        )
        x = x + out

        # per-(s f)-frame reduction (tome/patch/motionformer.py:147-170)
        if self.policy.mode != "none" and self.policy.r_at(layer) > 0:
            cls, body = x[:, 0:1, :], x[:, 1:, :]
            folded = _fold_space(body, x.shape[0], num_frames)
            folded, state = reduce_tokens(self.policy, layer, metric, folded, state)
            x = jnp.concatenate(
                [cls, _unfold_space(folded, x.shape[0], num_frames)], axis=1
            )

        x = x + Mlp(
            int(c.embed_dim * c.mlp_ratio), c.embed_dim, dtype=self.dtype, name="mlp"
        )(LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x))
        return x, state


class Motionformer(nn.Module):
    """Input: [B, T, H, W, C] channels-last (T = raw frames; the 3D
    patch embed reduces to temporal_resolution)."""

    config: MotionformerConfig
    policy: MergePolicy = MergePolicy()
    dtype: jnp.dtype = jnp.float32
    train_mode: bool = False  # inference applies softmax to logits
    layer_schedule: Optional[Tuple[int, ...]] = None  # block indices to run

    @nn.compact
    def __call__(self, x, state: Optional[MergeState] = None, rng: Optional[jax.Array] = None):
        c = self.config
        if state is None:
            state = MergeState(rng=rng)
        b = x.shape[0]
        x = x.astype(self.dtype)
        if c.patch_size_temp > 1:
            from vtm.models.common import TubeletEmbed

            # conv3d semantics via the fast 2-D path; (f n) frame-major
            emb = TubeletEmbed(
                c.embed_dim,
                tubelet=c.patch_size_temp,
                patch=c.patch_size,
                dtype=self.dtype,
                name="patch_embed_3d",
            )(x)
        else:
            frames = x.reshape(b * x.shape[1], *x.shape[2:])
            emb = nn.Conv(
                c.embed_dim,
                kernel_size=(c.patch_size, c.patch_size),
                strides=(c.patch_size, c.patch_size),
                padding="VALID",
                dtype=self.dtype,
                name="patch_embed",
            )(frames)
            emb = emb.reshape(b, -1, c.embed_dim)

        npatch = c.spatial_tokens
        f = c.temporal_resolution

        cls_param = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, c.embed_dim)
        )
        cls = jnp.broadcast_to(cls_param.astype(emb.dtype), (b, 1, c.embed_dim))
        x = jnp.concatenate([cls, emb], axis=1)

        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, npatch + 1, c.embed_dim)
        )
        if c.pos_embed_type == "separate":
            temp = self.param(
                "temp_embed", nn.initializers.zeros, (1, f, c.embed_dim)
            )
            tile_pos = jnp.tile(pos[:, 1:, :], (1, f, 1))
            tile_temp = jnp.repeat(temp, npatch, axis=1)
            total = jnp.concatenate([pos[:, :1, :], tile_pos + tile_temp], axis=1)
            x = x + total.astype(x.dtype)
        else:
            st = self.param(
                "st_embed",
                nn.initializers.normal(0.02),
                (1, npatch * f + 1, c.embed_dim),
            )
            x = x + st.astype(x.dtype)

        schedule = self.layer_schedule or tuple(range(c.depth))
        blocks = {}
        for step, layer_idx in enumerate(schedule):
            if layer_idx not in blocks:
                blocks[layer_idx] = MotionformerBlock(
                    c, self.policy, dtype=self.dtype, name=f"blocks_{layer_idx}"
                )
            x, state = blocks[layer_idx](x, state, layer=step, num_frames=f)

        x = LayerNorm(epsilon=c.layer_norm_eps, name="norm")(x)
        feats = x[:, 0]
        if c.use_mlp:
            feats = nn.Dense(c.embed_dim, dtype=self.dtype, name="pre_logits_fc")(feats)
            feats = {"tanh": jnp.tanh, "gelu": nn.gelu, "relu": nn.relu}[c.head_act](feats)

        def _head(name, n):
            logits = nn.Dense(n, dtype=jnp.float32, name=name)(feats)
            return logits if self.train_mode else nn.softmax(logits, axis=-1)

        if c.multi_head:
            logits = tuple(_head(f"head{i}", n) for i, n in enumerate(c.num_classes))
        else:
            logits = _head("head", c.num_classes)
        return logits, state


@register_model("Motionformer")
def _build_motionformer(cfg) -> ModelBundle:
    num_classes = (
        cfg.MODEL.NUM_CLASSES
        if cfg.EPICKITCHENS.NUM_CLASSES is None
        else tuple(cfg.EPICKITCHENS.NUM_CLASSES)
    )
    config = MotionformerConfig(
        img_size=cfg.DATA.TRAIN_CROP_SIZE,
        patch_size=cfg.MOTIONFORMER.PATCH_SIZE,
        patch_size_temp=cfg.MOTIONFORMER.PATCH_SIZE_TEMP,
        in_chans=cfg.MOTIONFORMER.CHANNELS,
        num_classes=num_classes,
        embed_dim=cfg.MOTIONFORMER.EMBED_DIM,
        depth=cfg.MOTIONFORMER.DEPTH,
        num_heads=cfg.MOTIONFORMER.NUM_HEADS,
        mlp_ratio=float(cfg.MOTIONFORMER.MLP_RATIO),
        qkv_bias=cfg.MOTIONFORMER.QKV_BIAS,
        temporal_resolution=cfg.MOTIONFORMER.TEMPORAL_RESOLUTION,
        use_mlp=cfg.MOTIONFORMER.USE_MLP,
        head_act=cfg.MOTIONFORMER.HEAD_ACT,
        pos_embed_type=cfg.MOTIONFORMER.POS_EMBED,
        attn_layer=cfg.MOTIONFORMER.ATTN_LAYER,
        use_original_code=cfg.MOTIONFORMER.USE_ORIGINAL_TRAJ_ATTN_CODE,
        approx_attn_type=cfg.MOTIONFORMER.APPROX_ATTN_TYPE,
        approx_attn_dim=cfg.MOTIONFORMER.APPROX_ATTN_DIM,
    )
    policy = make_policy(cfg, config.depth, n_protected_class_token=False)
    # full-block shared-weight duplication (reference motionformer.py:230-232)
    plan = duplication_plan(cfg, config.depth)
    schedule = tuple(idx for idx, _ in plan) if plan is not None else None
    module = Motionformer(
        config=config, policy=policy, dtype=compute_dtype(cfg), layer_schedule=schedule
    )
    return ModelBundle(module=module, params=None, config=config, policy=policy, name="Motionformer")
