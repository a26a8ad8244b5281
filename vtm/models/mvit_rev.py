"""Reversible MViT encoder (MVIT.REV) — TPU-native two-stream blocks.

Functional parity targets:
  slowfast/models/reversible_mvit.py (ReversibleMViT:12-180,
    RevBackProp:183-277, StageTransitionBlock:280-428,
    ReversibleBlock:431-612, MLPSubblock:615-640,
    AttentionSubBlock:643-696)
  slowfast/models/common.py (TwoStreamFusion:73-155)
  wiring: slowfast/models/video_model_builder.py:979-997, 1165-1186

Design (TPU-first):
- The two-stream state (X_1, X_2) is carried as two arrays; the
  reference's cat/chunk round-trips exist only at segment boundaries.
- The memory-saving backward (reference RevBackProp) is a
  ``flax.linen.custom_vjp`` per reversible segment: the forward saves
  ONLY (Y_1, Y_2); the backward reconstructs activations block by
  block (X_2 = Y_2 - G(Y_1); X_1 = Y_1 - F(X_2)) and accumulates
  parameter cotangents with jax.vjp on each sub-function. O(1)
  activation memory in segment depth, exactly like the reference.
- Stochastic-depth masks are sampled ONCE per block outside the
  custom-vjp function and passed in as inputs, replicating the
  reference's seed-reuse trick (reversible_mvit.py:487-508: the same
  "droppath" seed is used for the F- and G-side drops and for the
  backward recomputation).
- Stage transitions (Q-pooling layers) are standard autodiff blocks,
  as in the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vtm.models.common import LayerNorm, Mlp
from vtm.models.mvit import (
    AttentionPool,
    MultiScaleAttention,
    MViTSpec,
    _pool_thw,
    trunc02,
)


def _parse_concat_linear(mode: str):
    """(dim_mult, drop_rate) from 'concat_linear[_{dim_mult}[_{drop}]]'
    — the reference's length-based parse (common.py:112-127)."""
    parts = mode.split("_")
    if len(parts) == 2:
        return 1.0, 0.0
    if len(parts) == 3:
        return float(parts[-1]), 0.0
    if len(parts) == 4:
        return float(parts[-2]), float(parts[-1])
    raise NotImplementedError(f"fusion mode {mode}")


class TwoStreamFusion(nn.Module):
    """Fuse a channel-concatenated two-stream tensor
    (reference common.py:73-155). ``dim`` is the full (2x) input width,
    used only by the concat_linear variants (which also honour the
    optional trailing drop_rate when ``train=True``)."""

    mode: str
    dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mode = self.mode
        if mode in ("add", "max", "min", "avg"):
            a, b = jnp.split(x, 2, axis=-1)
            return {
                "add": lambda: a + b,
                "max": lambda: jnp.maximum(a, b),
                "min": lambda: jnp.minimum(a, b),
                "avg": lambda: (a + b) / 2.0,
            }[mode]()
        if mode == "concat":
            return x
        if "concat_linear" in mode:
            dim_mult, drop = _parse_concat_linear(mode)
            y = x
            if mode.split("+")[0] == "ln":
                y = LayerNorm(epsilon=1e-6, name="ln")(y)
            y = Mlp(
                int(self.dim * dim_mult), self.dim, dropout=drop, name="mlp"
            )(y, deterministic=not train)
            return y + x
        raise NotImplementedError(f"fusion mode {mode}")


class MLPSubblock(nn.Module):
    """G: LayerNorm + Mlp (reference reversible_mvit.py:615-640)."""

    dim: int
    mlp_ratio: float
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = LayerNorm(epsilon=self.norm_eps, name="norm")(x)
        return Mlp(
            int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
            name="mlp",
        )(x)


class AttentionSubBlock(nn.Module):
    """F: LayerNorm + MultiScaleAttention with a statically-known input
    thw (reference reversible_mvit.py:643-696)."""

    dim_out: int
    num_heads: int
    input_size: Tuple[int, int, int]
    thw: Tuple[int, int, int]
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
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm = LayerNorm(epsilon=self.norm_eps)
        self.attn = MultiScaleAttention(
            dim_out=self.dim_out,
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
        )

    def __call__(self, x, x_res=None):
        if x_res is not None:
            out, _, pooled = self.attn(self.norm(x), self.thw, x_res=x_res)
            return out, pooled
        out, _ = self.attn(self.norm(x), self.thw)
        return out


class ReversibleBlock(nn.Module):
    """Two-stream reversible block (reference reversible_mvit.py:431-545):
    Y_1 = X_1 + F(X_2); Y_2 = X_2 + G(Y_1)."""

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
    separate_qkv: bool
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.dim == self.dim_out, (
            "a reversible block must preserve width", self.dim, self.dim_out
        )
        assert not self.stride_q or int(np.prod(self.stride_q)) == 1, (
            "Q-pooling layers must be listed in MVIT.REV.BUFFER_LAYERS"
        )
        self.F = AttentionSubBlock(
            dim_out=self.dim_out,
            num_heads=self.num_heads,
            input_size=self.input_size,
            thw=self.input_size,
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
            norm_eps=self.norm_eps,
            dtype=self.dtype,
        )
        self.G = MLPSubblock(
            dim=self.dim, mlp_ratio=self.mlp_ratio,
            norm_eps=self.norm_eps, dtype=self.dtype,
        )

    def call_f(self, x):
        return self.F(x)

    def call_g(self, x):
        return self.G(x)

    def __call__(self, x1, x2, dp_mask=None):
        f_x2 = self.call_f(x2)
        if dp_mask is not None:  # mask already scaled by 1/keep
            f_x2 = f_x2 * dp_mask.astype(f_x2.dtype)
        y1 = x1 + f_x2
        g_y1 = self.call_g(y1)
        if dp_mask is not None:  # same mask (reference seed reuse, :535)
            g_y1 = g_y1 * dp_mask.astype(g_y1.dtype)
        y2 = x2 + g_y1
        return y1, y2


class StageTransitionBlock(nn.Module):
    """Irreversible Q-pooling layer between reversible segments
    (reference reversible_mvit.py:280-428). Input is the previous
    segment's channel-concat two-stream tensor."""

    dim: int  # F input width (post pre_q fusion)
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
    separate_qkv: bool
    pre_q_fusion: str = "avg"
    res_path: str = "conv"
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if "concat_linear" in self.pre_q_fusion:
            # the custom-VJP reversible backward recomputes forwards with
            # the droppath seed-reuse trick only; threading a fusion
            # dropout rng through it is not supported — fail loudly
            # rather than silently training without the requested dropout
            if _parse_concat_linear(self.pre_q_fusion)[1] > 0.0:
                raise NotImplementedError(
                    "PRE_Q_FUSION dropout inside the reversible stack"
                )
        self.pre_q_fuse = TwoStreamFusion(self.pre_q_fusion, dim=self.dim)
        self.F = AttentionSubBlock(
            dim_out=self.dim_out,
            num_heads=self.num_heads,
            input_size=self.input_size,
            thw=self.input_size,
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
            norm_eps=self.norm_eps,
            dtype=self.dtype,
        )
        self.G = MLPSubblock(
            dim=self.dim_out, mlp_ratio=self.mlp_ratio,
            norm_eps=self.norm_eps, dtype=self.dtype,
        )
        if self.dim != self.dim_out:
            self.res_proj = nn.Dense(
                self.dim_out, dtype=self.dtype, kernel_init=trunc02,
                bias_init=nn.initializers.constant(0.02),
            )
        if self.res_path == "max":
            stride = tuple(self.stride_q)
            self.pool_skip = AttentionPool(
                tuple(s + 1 if s > 1 else s for s in stride), stride,
                "max", dim_conv=0, has_cls=self.has_cls,
                pad_override=tuple(s // 2 for s in stride),
            )

    def __call__(self, x, dp_mask=None):
        x = self.pre_q_fuse(x)
        x_res = x
        is_proj = self.dim != self.dim_out
        if is_proj and not self.pool_first:
            x_res = self.res_proj(x_res)

        b, l, c = x_res.shape
        if self.res_path == "conv":
            # pool the residual with the SAME conv (+norm) as Q
            fold = self.num_heads if self.mode != "conv_unshared" else 1
            xr = x_res.reshape(b, l, fold, c // fold).transpose(0, 2, 1, 3)
            fx, pooled = self.F(x, x_res=xr)
            x_res = pooled.transpose(0, 2, 1, 3).reshape(
                b, pooled.shape[2], c
            )
        elif self.res_path == "max":
            x_res, _ = self.pool_skip(x_res[:, None], self.input_size)
            x_res = x_res[:, 0]
            fx = self.F(x)
        else:
            raise NotImplementedError(self.res_path)

        if is_proj and self.pool_first:
            x_res = self.res_proj(x_res)

        x = x_res + fx
        x = x + self.G(x)
        if dp_mask is not None:
            # quirk kept: the reference drop-paths the ENTIRE output
            # (residual included), reversible_mvit.py:426
            x = x * dp_mask.astype(x.dtype)
        return x


def _segment_layout(plan):
    """Group layer indices into ('transition', i) / ('rev', [i...])
    runs (reference forward stack logic, reversible_mvit.py:147-156)."""
    segments = []
    for i, blk in enumerate(plan):
        if blk["is_transition"]:
            segments.append(("transition", i))
        else:
            if not segments or segments[-1][0] == "transition":
                segments.append(("rev", []))
            segments[-1][1].append(i)
    return segments


class ReversibleMViT(nn.Module):
    """The reversible encoder stack (reference reversible_mvit.py:12-180).

    Returns the channel-concat two-stream tensor [B, N, 2*C_final].
    ``use_rev_backward=True`` (training) routes every reversible segment
    through the O(1)-memory custom VJP; False uses plain autodiff over
    identical math (the reference's vanilla_backward / eval path).
    """

    spec: MViTSpec
    dtype: jnp.dtype = jnp.float32
    is_training: bool = False
    use_rev_backward: bool = True

    def setup(self):
        s = self.spec
        plan = s.rev_block_plan()
        self._plan = tuple(
            tuple(sorted(b.items(), key=lambda kv: kv[0])) for b in plan
        )
        layers = []
        for i, blk in enumerate(plan):
            common = dict(
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
                separate_qkv=s.separate_qkv,
                norm_eps=s.norm_eps,
                dtype=self.dtype,
            )
            if blk["is_transition"]:
                assert i > 0, "a stage transition cannot be layer 0"
                layers.append(
                    StageTransitionBlock(
                        pre_q_fusion=s.rev_pre_q_fusion,
                        res_path=s.rev_res_path,
                        **common,
                    )
                )
            else:
                layers.append(ReversibleBlock(**common))
        self.layers = layers
        self.dropout = nn.Dropout(s.dropout_rate)

    def _dp_mask(self, rate, batch):
        """Scaled stochastic-depth keep mask, or None."""
        if not self.is_training or rate <= 0.0:
            return None
        keep = 1.0 - rate
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep, (batch, 1, 1)
        )
        return mask.astype(jnp.float32) / keep

    def _run_segment_plain(self, idxs, x1, x2, masks):
        for j, i in enumerate(idxs):
            m = None if masks is None else masks[j]
            x1, x2 = self.layers[i](x1, x2, m)
        return x1, x2

    def _run_segment_rev(self, idxs, x1, x2, masks):
        """Reversible segment with the memory-saving backward
        (reference RevBackProp:183-277)."""
        kwargs_by_idx = {i: dict(self._plan[i]) for i in idxs}
        spec = self.spec
        dtype = self.dtype

        def block_template(i):
            kw = dict(kwargs_by_idx[i])
            kw.pop("is_transition")
            return ReversibleBlock(
                mlp_ratio=spec.mlp_ratio,
                qkv_bias=spec.qkv_bias,
                mode=spec.mode,
                has_cls=spec.cls_embed_on,
                pool_first=spec.pool_first,
                rel_pos_spatial=spec.rel_pos_spatial,
                rel_pos_temporal=spec.rel_pos_temporal,
                rel_pos_zero_init=spec.rel_pos_zero_init,
                residual_pooling=spec.residual_pooling,
                separate_qkv=spec.separate_qkv,
                norm_eps=spec.norm_eps,
                dtype=dtype,
                **kw,
            )

        def fn(mdl, x1, x2, masks):
            return mdl._run_segment_plain(idxs, x1, x2, masks)

        def fwd(mdl, x1, x2, masks):
            y1, y2 = fn(mdl, x1, x2, masks)
            params = mdl.variables["params"]
            return (y1, y2), (params, y1, y2, masks)

        def bwd(res, grads):
            params, y1, y2, masks = res
            dy1, dy2 = grads
            dparams = jax.tree.map(jnp.zeros_like, params)
            dparams = dict(dparams)
            for j in range(len(idxs) - 1, -1, -1):
                i = idxs[j]
                p_i = params[f"layers_{i}"]
                tmpl = block_template(i)
                m = None if masks is None else masks[j]

                def g_fun(p, y):
                    out = tmpl.apply(
                        {"params": p}, y, method=ReversibleBlock.call_g
                    )
                    if m is not None:
                        out = out * m.astype(out.dtype)
                    return out

                def f_fun(p, z):
                    out = tmpl.apply(
                        {"params": p}, z, method=ReversibleBlock.call_f
                    )
                    if m is not None:
                        out = out * m.astype(out.dtype)
                    return out

                g_y1, g_vjp = jax.vjp(g_fun, p_i, y1)
                x2 = y2 - g_y1
                dp_g, dy1_add = g_vjp(dy2)
                dy1 = dy1 + dy1_add

                f_x2, f_vjp = jax.vjp(f_fun, p_i, x2)
                x1 = y1 - f_x2
                dp_f, dx2_add = f_vjp(dy1)
                dy2 = dy2 + dx2_add

                dparams[f"layers_{i}"] = jax.tree.map(
                    jnp.add, dp_g, dp_f
                )
                y1, y2 = x1, x2
            dmasks = None if masks is None else jnp.zeros_like(masks)
            return ({"params": dparams}, dy1, dy2, dmasks)

        return nn.custom_vjp(fn, forward_fn=fwd, backward_fn=bwd)(
            self, x1, x2, masks
        )

    def __call__(self, x):
        s = self.spec
        dpr = np.linspace(0, s.droppath_rate, s.depth)
        plan = [dict(p) for p in self._plan]
        segments = _segment_layout(plan)
        b = x.shape[0]
        for kind, payload in segments:
            if kind == "transition":
                x = self.layers[payload](x, self._dp_mask(dpr[payload], b))
            else:
                idxs = payload
                masks = None
                if self.is_training and s.droppath_rate > 0.0:
                    masks = jnp.stack([
                        self._dp_mask(dpr[i], b)
                        if dpr[i] > 0.0
                        else jnp.ones((b, 1, 1), jnp.float32)
                        for i in idxs
                    ])
                x1 = x2 = x
                if self.is_training and self.use_rev_backward:
                    x1, x2 = self._run_segment_rev(idxs, x1, x2, masks)
                else:
                    x1, x2 = self._run_segment_plain(idxs, x1, x2, masks)
                x = jnp.concatenate([x1, x2], axis=-1)
        if self.is_training and s.dropout_rate > 0.0:
            x = self.dropout(x, deterministic=False)
        return x
