"""Shared model components (flax.linen), TPU-first.

Conventions:
  * activations in ``dtype`` (bf16 by default), params in fp32,
    layernorms/softmax in fp32;
  * video tensors are channels-last [B, T, H, W, C] on device (the
    drivers permute from the reference's [B, C, T, H, W]);
  * attention modules return ``(out, metric)`` where metric is the
    head-aggregated key tensor used for token matching (reference:
    e.g. tome/patch/videomae.py:72-75).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sin-cos positional table (reference:
    slowfast/models/videomae_video_model_builder.py:164-174)."""
    position = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = position / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


def aggregate_metric(k: jnp.ndarray, head_aggregation: str) -> jnp.ndarray:
    """Aggregate per-head keys [B, H, N, hd] into a matching metric.

    'mean'   -> [B, N, hd]   (reference k.mean(1))
    'concat' -> [B, N, H*hd] (reference torch.cat(k.split(1,1), -1))
    """
    if head_aggregation == "mean":
        return k.mean(axis=1)
    if head_aggregation == "concat":
        b, h, n, hd = k.shape
        return jnp.transpose(k, (0, 2, 1, 3)).reshape(b, n, h * hd)
    raise ValueError(f"unknown head_aggregation {head_aggregation!r}")


def proportional_attn_bias(size: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """log(size) bias broadcast over queries/heads: [B, N, 1] ->
    [B, 1, 1, N] added to attention logits (reference: e.g.
    tome/patch/vivit.py:103-104)."""
    if size is None:
        return None
    return jnp.log(size[:, :, 0])[:, None, None, :]


def drop_path(module: nn.Module, z: jnp.ndarray, rate: float, train: bool):
    """Stochastic depth on a residual branch (timm semantics: per-sample
    bernoulli keep, scaled by 1/keep). Uses the module's 'dropout' rng."""
    if not train or rate <= 0.0:
        return z
    keep = 1.0 - rate
    mask = jax.random.bernoulli(
        module.make_rng("dropout"), keep, (z.shape[0],) + (1,) * (z.ndim - 1)
    )
    return z * mask.astype(z.dtype) / keep


class TubeletEmbed(nn.Module):
    """Tubelet embedding [B, T, H, W, C] -> [B, T/t * H/p * W/p, dim].

    Numerically identical to a VALID Conv3d with kernel = stride =
    (t, p, p) and the SAME parameter layout ((t, p, p, C, dim) kernel),
    but computed as a 2-D conv over frame-stacked channels: XLA lowers
    the 5-D tubelet conv through a slow path on TPU (~2.5 ms for
    VideoMAE ViT-B inputs vs ~0.66 ms for this formulation). Frames
    within a tubelet are folded into the channel axis (t-major, matching
    the kernel reshape), so the only data movement is one channel
    concat.
    """

    features: int
    tubelet: int  # temporal extent t
    patch: int  # spatial extent p
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v):
        import jax

        t, p, c = self.tubelet, self.patch, v.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (t, p, p, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        b, frames, h, w, _ = v.shape
        x = v.astype(self.dtype).reshape(b * (frames // t), t, h, w, c)
        # fold the tubelet's frames into channels, t-major
        x = jnp.concatenate([x[:, i] for i in range(t)], axis=-1)
        k2 = jnp.transpose(kernel.astype(self.dtype), (1, 2, 0, 3, 4)).reshape(
            p, p, t * c, self.features
        )
        y = jax.lax.conv_general_dilated(
            x,
            k2,
            window_strides=(p, p),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bias.astype(self.dtype)
        return y.reshape(b, -1, self.features)


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> GELU -> fc2 (+dropout when training)."""

    hidden_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0
    approximate_gelu: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.approximate_gelu)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class LayerNorm(nn.LayerNorm):
    """fp32 layernorm regardless of activation dtype."""

    def __call__(self, x):
        return super().__call__(x.astype(jnp.float32)).astype(x.dtype)


# Unbiased attention fuses well in XLA (probs materialize once, bf16) —
# the kernel only wins above ~256 tokens. The same crossover holds for
# the key-biased form now that the einsum path fuses the bias into the
# softmax chain instead of scattering (measured bt=64 h=12 hd=64:
# N=197 einsum 0.56 ms vs kernel 0.78; N=256 kernel 0.44 vs einsum
# 0.63; N>=384 kernel wins 1.5-4x). The old 160 threshold dated from
# comparing against the scatter-shaped einsum (4.2 ms at N=197).
_FLASH_MIN_SEQ = 256
_FLASH_MIN_SEQ_BIASED = 256
_FLASH_MAX_SEQ = 4096  # whole-row K/V must fit in VMEM


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    size_bias: Optional[jnp.ndarray] = None,
    bias_excludes_first: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, N, hd] with optional
    proportional-attention bias.

    On TPU with long sequences this dispatches to the fused Pallas
    kernel (vtm/ops/flash_attention.py: no [N, N] logits in HBM, fp32
    softmax inside, native per-key log-size bias); otherwise an einsum
    path with fp32 softmax.

    ``bias_excludes_first``: TimeSformer adds size.log only to the
    non-CLS block of the logits — ``size_bias`` has key length N-1 and
    is added to logits[:, :, 1:, 1:] (reference
    tome/patch/timesformer.py:73-74). On the kernel path that
    decomposes exactly into a pure key bias [0, log s] applied to every
    query row plus ONE unbiased row for the CLS query (bias at key 0 is
    zero, so column 0 is untouched). On the einsum path the same bias
    is the rank-1 product row_mask ⊗ [0, log s], fused by XLA into the
    softmax — never the scatter-shaped ``.at[1:, 1:].add``
    (4.2 ms/layer vs 0.6 ms at TimeSformer N=197).
    """
    n = q.shape[2]
    kernel_ok = (
        _on_tpu() and q.shape[2] == k.shape[2] and n <= _FLASH_MAX_SEQ
    )

    def _einsum(q_, bias_vec):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q_ * scale, k, preferred_element_type=jnp.float32
        )
        if bias_vec is not None:
            logits = logits + bias_vec[:, None, None, :].astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    if size_bias is None:
        if kernel_ok and n >= _FLASH_MIN_SEQ:
            from vtm.ops.flash_attention import tome_flash_attention

            return tome_flash_attention(q, k, v, None, scale)
        return _einsum(q, None)

    if not bias_excludes_first:
        key_bias = size_bias[:, 0, 0, :]
        if kernel_ok and n >= _FLASH_MIN_SEQ_BIASED:
            from vtm.ops.flash_attention import tome_flash_attention

            return tome_flash_attention(q, k, v, key_bias, scale)
        return _einsum(q, key_bias)

    # CLS-excluded bias. Kernel path: rows 1.. with the zero-padded key
    # bias, row 0 unbiased (computed separately — one query row,
    # negligible). Einsum path: the bias is the rank-1 outer product
    # row_mask[q] * key_bias[k] (row 0 zeroed by the mask, column 0 by
    # the pad), which XLA fuses straight into the softmax chain — no
    # scatter, no separate CLS row, no output concat (the concat
    # epilogue alone cost ~0.6 ms/layer at TimeSformer N=197).
    b = size_bias.shape[0]
    key_bias = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.float32), size_bias[:, 0, 0, :].astype(jnp.float32)],
        axis=1,
    )
    if kernel_ok and n >= _FLASH_MIN_SEQ_BIASED:
        from vtm.ops.flash_attention import tome_flash_attention

        out = tome_flash_attention(q, k, v, key_bias, scale)
        out0 = _einsum(q[:, :, :1], None)
        return jnp.concatenate([out0, out[:, :, 1:]], axis=2)
    row_mask = (jnp.arange(n) > 0).astype(jnp.float32)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    logits = logits + row_mask[None, None, :, None] * key_bias[:, None, None, :]
    probs = nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, N, hd] -> [B, N, H*hd]."""
    b, h, n, hd = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, n, h * hd)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, N, C] -> [B, H, N, C/H]."""
    b, n, c = x.shape
    return jnp.transpose(x.reshape(b, n, num_heads, c // num_heads), (0, 2, 1, 3))
