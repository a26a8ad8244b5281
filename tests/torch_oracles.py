"""Hand-written torch re-derivations of the reference's merged forwards.

Each function drives an HF state dict through the exact per-layer math of
the reference ToMe patch for that backbone, calling the reference merge
implementation (/root/reference/tome/merge.py, imported via conftest's
``ref_merge`` fixture) for the token reduction. These are the numeric
oracles for the vtm flax models' merged forwards.

All math runs in torch fp32 on CPU with no_grad.
"""

from __future__ import annotations

import numpy as np


def _reduce(ref_merge, metric, x, size, r, *, class_token, mode, threshold):
    """The reference per-mode reduction step (tome/patch/videomae.py:
    80-151 — same shape in every patch): merge/hybrid go through
    merge_wavg; drop discards tokens and RESETS size to ones."""
    import torch

    if r <= 0:
        return x, size
    if mode == "drop":
        dfn = ref_merge.bipartite_soft_matching_drop(
            metric, r, class_token=class_token
        )
        x = dfn(x)
        size = torch.ones((x.size(0), x.size(1), 1))
    elif mode == "hybrid":
        mfn, _ = ref_merge.bipartite_soft_matching_hybrid(
            metric, r, class_token, False, mode, threshold
        )
        x, size = ref_merge.merge_wavg(mfn, x, size)
    else:
        mfn, _ = ref_merge.bipartite_soft_matching(
            metric, r, class_token=class_token
        )
        x, size = ref_merge.merge_wavg(mfn, x, size)
    return x, size


def videomae_tome_forward(sd, video, rs, ref_merge, *, depth, heads, embed_dim,
                          tubelet, patch, prop_attn=True, eps=1e-12,
                          mode="merge", threshold=0.0):
    """Reference tome/patch/videomae.py:13-77 semantics from an HF
    VideoMAEForVideoClassification state dict. video: [B,T,H,W,3] numpy."""
    import torch
    import torch.nn.functional as F

    from vtm.models.common import sinusoid_encoding_table

    t = lambda key: sd[key]
    with torch.no_grad():
        v = torch.from_numpy(video).permute(0, 4, 1, 2, 3)  # B,C,T,H,W
        x = F.conv3d(
            v,
            t("videomae.embeddings.patch_embeddings.projection.weight"),
            t("videomae.embeddings.patch_embeddings.projection.bias"),
            stride=(tubelet, patch, patch),
        )
        x = x.flatten(2).transpose(1, 2)
        x = x + torch.from_numpy(sinusoid_encoding_table(x.shape[1], embed_dim))
        size = None
        for i in range(depth):
            pre = f"videomae.encoder.layer.{i}"
            xn = F.layer_norm(
                x, (embed_dim,),
                t(f"{pre}.layernorm_before.weight"), t(f"{pre}.layernorm_before.bias"),
                eps=eps,
            )
            B, N, C = xn.shape
            q = F.linear(xn, t(f"{pre}.attention.attention.query.weight"),
                         t(f"{pre}.attention.attention.q_bias"))
            k = F.linear(xn, t(f"{pre}.attention.attention.key.weight"))
            vv = F.linear(xn, t(f"{pre}.attention.attention.value.weight"),
                          t(f"{pre}.attention.attention.v_bias"))
            q, k, vv = (z.view(B, N, heads, C // heads).transpose(1, 2) for z in (q, k, vv))
            attn = q @ k.transpose(-2, -1) * (C // heads) ** -0.5
            if prop_attn and size is not None:
                attn = attn + size.log()[:, None, None, :, 0]
            attn = attn.softmax(-1)
            ctx = (attn @ vv).transpose(1, 2).reshape(B, N, C)
            ctx = F.linear(ctx, t(f"{pre}.attention.output.dense.weight"),
                           t(f"{pre}.attention.output.dense.bias"))
            x = x + ctx
            metric = k.mean(1)
            x, size = _reduce(ref_merge, metric, x, size, rs[i],
                              class_token=False, mode=mode, threshold=threshold)
            xn2 = F.layer_norm(
                x, (embed_dim,),
                t(f"{pre}.layernorm_after.weight"), t(f"{pre}.layernorm_after.bias"),
                eps=eps,
            )
            h1 = F.gelu(F.linear(xn2, t(f"{pre}.intermediate.dense.weight"),
                                 t(f"{pre}.intermediate.dense.bias")))
            x = x + F.linear(h1, t(f"{pre}.output.dense.weight"), t(f"{pre}.output.dense.bias"))
        feats = F.layer_norm(x.mean(1), (embed_dim,), t("fc_norm.weight"), t("fc_norm.bias"), eps=eps)
        return F.linear(feats, t("classifier.weight"), t("classifier.bias")).numpy(), x.shape[1]


def vivit_tome_forward(sd, video, rs, ref_merge, *, depth, heads, embed_dim,
                       tubelet_size, prop_attn=True, eps=1e-6,
                       mode="merge", threshold=0.0):
    """Reference tome/patch/vivit.py:17-130 semantics from an HF
    VivitForVideoClassification state dict: CLS-protected merging after
    the attention residual, full-column proportional-attention bias,
    gelu_fast MLP. video: [B,T,H,W,3] numpy."""
    import torch
    import torch.nn.functional as F

    t = lambda key: sd[key]
    with torch.no_grad():
        v = torch.from_numpy(video).permute(0, 4, 1, 2, 3)  # B,C,T,H,W
        x = F.conv3d(
            v,
            t("vivit.embeddings.patch_embeddings.projection.weight"),
            t("vivit.embeddings.patch_embeddings.projection.bias"),
            stride=tuple(tubelet_size),
        )
        x = x.flatten(2).transpose(1, 2)
        B = x.shape[0]
        cls = t("vivit.embeddings.cls_token").expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + t("vivit.embeddings.position_embeddings")
        size = None
        for i in range(depth):
            pre = f"vivit.encoder.layer.{i}"
            xn = F.layer_norm(
                x, (embed_dim,),
                t(f"{pre}.layernorm_before.weight"), t(f"{pre}.layernorm_before.bias"),
                eps=eps,
            )
            B, N, C = xn.shape
            q = F.linear(xn, t(f"{pre}.attention.attention.query.weight"),
                         t(f"{pre}.attention.attention.query.bias"))
            k = F.linear(xn, t(f"{pre}.attention.attention.key.weight"),
                         t(f"{pre}.attention.attention.key.bias"))
            vv = F.linear(xn, t(f"{pre}.attention.attention.value.weight"),
                          t(f"{pre}.attention.attention.value.bias"))
            q, k, vv = (z.view(B, N, heads, C // heads).transpose(1, 2) for z in (q, k, vv))
            attn = q @ k.transpose(-2, -1) * (C // heads) ** -0.5
            if prop_attn and size is not None:
                # reference vivit patch: bias over ALL columns (:103-104)
                attn = attn + size.log()[:, None, None, :, 0]
            attn = attn.softmax(-1)
            ctx = (attn @ vv).transpose(1, 2).reshape(B, N, C)
            ctx = F.linear(ctx, t(f"{pre}.attention.output.dense.weight"),
                           t(f"{pre}.attention.output.dense.bias"))
            x = ctx + x
            metric = k.mean(1)
            x, size = _reduce(ref_merge, metric, x, size, rs[i],
                              class_token=True, mode=mode, threshold=threshold)
            xn2 = F.layer_norm(
                x, (embed_dim,),
                t(f"{pre}.layernorm_after.weight"), t(f"{pre}.layernorm_after.bias"),
                eps=eps,
            )
            h1 = F.gelu(F.linear(xn2, t(f"{pre}.intermediate.dense.weight"),
                                 t(f"{pre}.intermediate.dense.bias")),
                        approximate="tanh")
            x = x + F.linear(h1, t(f"{pre}.output.dense.weight"), t(f"{pre}.output.dense.bias"))
        x = F.layer_norm(x, (embed_dim,), t("vivit.layernorm.weight"), t("vivit.layernorm.bias"), eps=eps)
        return F.linear(x[:, 0], t("classifier.weight"), t("classifier.bias")).numpy(), x.shape[1]


def timesformer_tome_forward(sd, video, rs, ref_merge, *, depth, heads, embed_dim,
                             patch, prop_attn=True, eps=1e-6,
                             mode="merge", threshold=0.0):
    """Reference tome/patch/timesformer.py:12-109 semantics from an HF
    TimesformerForVideoClassification state dict: divided space-time
    attention, CLS detached per frame (strip + frame-average), the
    ``attn[:, :, 1:, 1:] += size.log()`` bias, per-frame merging of the
    '(b t) p' fold. video: [B,T,H,W,3] numpy."""
    import torch
    import torch.nn.functional as F

    t = lambda key: sd[key]

    def attention(xin, pre, size=None, want_metric=False):
        B, N, C = xin.shape
        qkv = F.linear(xin, t(f"{pre}.attention.qkv.weight"), t(f"{pre}.attention.qkv.bias"))
        qkv = qkv.view(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
        q, k, vv = qkv[0], qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1) * (C // heads) ** -0.5
        if size is not None:
            # reference ToMeAttention: bias only on the non-CLS block (:73-75)
            attn[:, :, 1:, 1:] = attn[:, :, 1:, 1:] + size.log()[:, None, None, :, 0]
        attn = attn.softmax(-1)
        out = (attn @ vv).transpose(1, 2).reshape(B, N, C)
        out = F.linear(out, t(f"{pre}.output.dense.weight"), t(f"{pre}.output.dense.bias"))
        if want_metric:
            return out, k.mean(1)[:, 1:, :]
        return out

    with torch.no_grad():
        B, T = video.shape[0], video.shape[1]
        v = torch.from_numpy(video).reshape(B * T, *video.shape[2:]).permute(0, 3, 1, 2)
        emb = F.conv2d(
            v,
            t("timesformer.embeddings.patch_embeddings.projection.weight"),
            t("timesformer.embeddings.patch_embeddings.projection.bias"),
            stride=(patch, patch),
        )
        emb = emb.flatten(2).transpose(1, 2)  # [(b t), P, D]
        P = emb.shape[1]
        pos = t("timesformer.embeddings.position_embeddings")
        emb = emb + pos[:, 1:, :]
        cls = t("timesformer.embeddings.cls_token") + pos[:, 0:1, :]
        # time embedding on the (b p) t fold
        xt = emb.reshape(B, T, P, embed_dim).permute(0, 2, 1, 3).reshape(B * P, T, embed_dim)
        xt = xt + t("timesformer.embeddings.time_embeddings")
        body = xt.reshape(B, P * T, embed_dim)  # '(p t)' order
        x = torch.cat([cls.expand(B, -1, -1), body], dim=1)

        size = None
        for i in range(depth):
            pre = f"timesformer.encoder.layer.{i}"
            p_now = (x.shape[1] - 1) // T
            # temporal attention over (b p) t
            xt = x[:, 1:, :].reshape(B, p_now, T, embed_dim).reshape(B * p_now, T, embed_dim)
            xt_n = F.layer_norm(xt, (embed_dim,),
                                t(f"{pre}.temporal_layernorm.weight"),
                                t(f"{pre}.temporal_layernorm.bias"), eps=eps)
            res_t = attention(xt_n, f"{pre}.temporal_attention")
            res_t = res_t.reshape(B, p_now * T, embed_dim)
            res_t = F.linear(res_t, t(f"{pre}.temporal_dense.weight"), t(f"{pre}.temporal_dense.bias"))
            xt = x[:, 1:, :] + res_t

            # spatial attention over (b t) p with broadcast CLS
            init_cls = x[:, 0:1, :]
            cls_rep = init_cls.repeat(1, T, 1).reshape(B * T, 1, embed_dim)
            xs = xt.reshape(B, p_now, T, embed_dim).permute(0, 2, 1, 3).reshape(B * T, p_now, embed_dim)
            xs = torch.cat([cls_rep, xs], dim=1)
            xs_n = F.layer_norm(xs, (embed_dim,),
                                t(f"{pre}.layernorm_before.weight"),
                                t(f"{pre}.layernorm_before.bias"), eps=eps)
            res_s, metric = attention(xs_n, f"{pre}.attention", size=size if prop_attn else None,
                                      want_metric=True)
            cls_out = res_s[:, 0, :].reshape(B, T, embed_dim).mean(1, keepdim=True)
            res_sp = res_s[:, 1:, :].reshape(B, T, p_now, embed_dim).permute(0, 2, 1, 3).reshape(B, p_now * T, embed_dim)
            x = torch.cat([init_cls + cls_out, xt + res_sp], dim=1)

            # per-frame merge (reference timesformer_merge:85-109)
            if rs[i] > 0:
                clst, merged = x[:, 0:1, :], x[:, 1:, :]
                merged = merged.reshape(B, p_now, T, embed_dim).permute(0, 2, 1, 3).reshape(B * T, p_now, embed_dim)
                merged, size = _reduce(
                    ref_merge, metric, merged, size, rs[i],
                    class_token=False, mode=mode, threshold=threshold,
                )
                p_new = merged.shape[1]
                merged = merged.reshape(B, T, p_new, embed_dim).permute(0, 2, 1, 3).reshape(B, p_new * T, embed_dim)
                x = torch.cat([clst, merged], dim=1)

            xn2 = F.layer_norm(x, (embed_dim,),
                               t(f"{pre}.layernorm_after.weight"),
                               t(f"{pre}.layernorm_after.bias"), eps=eps)
            h1 = F.gelu(F.linear(xn2, t(f"{pre}.intermediate.dense.weight"),
                                 t(f"{pre}.intermediate.dense.bias")))
            x = x + F.linear(h1, t(f"{pre}.output.dense.weight"), t(f"{pre}.output.dense.bias"))

        x = F.layer_norm(x, (embed_dim,), t("timesformer.layernorm.weight"),
                         t("timesformer.layernorm.bias"), eps=eps)
        logits = F.linear(x[:, 0], t("classifier.weight"), t("classifier.bias")).numpy()
        return logits, x.shape[1]


def as_numpy(x) -> np.ndarray:
    return np.asarray(x)
