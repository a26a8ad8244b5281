"""Motionformer golden tests.

No HF equivalent and the reference model needs timm (unavailable), so
the oracle is an in-test torch re-derivation of trajectory attention
(helper:146-267) + the ToMe patch semantics
(tome/patch/motionformer.py:33-144), driven by the reference merge
implementation, fed with the SAME weights as the flax model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtm.merge.policy import MergePolicy
from vtm.models.motionformer import Motionformer, MotionformerConfig

TINY = MotionformerConfig(
    img_size=32,
    patch_size=16,
    patch_size_temp=2,
    num_classes=5,
    embed_dim=32,
    depth=2,
    num_heads=2,
    mlp_ratio=2.0,
    temporal_resolution=2,
)
T_IN = 4  # raw input frames -> 2 after temporal patching


def _init(policy=MergePolicy()):
    model = Motionformer(config=TINY, policy=policy)
    video = jnp.zeros((1, T_IN, 32, 32, 3))
    params = model.init(jax.random.key(42), video)["params"]
    return model, params


def _torch_oracle(params, video, ref_merge=None, rs=(0, 0), prop_attn=True, cfg=None,
                  mode="merge", threshold=0.0):
    import torch
    import torch.nn.functional as TF

    def t(arr):
        return torch.from_numpy(np.asarray(arr, dtype=np.float32))

    def dense(p, x):
        return TF.linear(x, t(p["kernel"]).T, t(p["bias"]) if "bias" in p else None)

    c = cfg or TINY
    h, d = c.num_heads, c.embed_dim
    hd = d // h
    f = c.temporal_resolution
    scale = hd ** -0.5

    with torch.no_grad():
        v = t(video).permute(0, 4, 1, 2, 3)  # B,C,T,H,W
        w3 = t(params["patch_embed_3d"]["kernel"]).permute(4, 3, 0, 1, 2)
        x = TF.conv3d(
            v, w3, t(params["patch_embed_3d"]["bias"]),
            stride=(c.patch_size_temp, c.patch_size, c.patch_size),
        )
        x = x.flatten(2).transpose(1, 2)  # (f n) frame-major
        B = x.shape[0]
        npatch = c.spatial_tokens
        cls = t(params["cls_token"]).expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        pos = t(params["pos_embed"])
        temp = t(params["temp_embed"])
        tile_pos = pos[:, 1:, :].repeat(1, f, 1)
        tile_temp = temp.repeat_interleave(npatch, 1)
        x = x + torch.cat([pos[:, :1, :], tile_pos + tile_temp], dim=1)

        size = None
        for i in range(c.depth):
            blk = params[f"blocks_{i}"]
            xn = TF.layer_norm(
                x, (d,), t(blk["norm1"]["scale"]), t(blk["norm1"]["bias"]), eps=1e-6
            )
            q, k, vv = dense(blk["attn"]["qkv"], xn).chunk(3, dim=-1)
            q, k, vv = (
                z.reshape(B, -1, h, hd).permute(0, 2, 1, 3).reshape(B * h, -1, hd)
                for z in (q, k, vv)
            )
            cls_q, q_ = q[:, :1], q[:, 1:]
            k_full, v_full = k, vv
            k_, v_ = k[:, 1:], vv[:, 1:]
            # CLS attends over all tokens
            cls_out = (cls_q * scale) @ k_full.transpose(-2, -1)
            cls_out = cls_out.softmax(-1) @ v_full
            cls_out = cls_out.reshape(B, h, 1, hd).permute(0, 2, 1, 3).reshape(B, 1, d)
            n_body = q_.shape[1]
            s = n_body // f
            q_dot_k = (q_ @ k_.transpose(-2, -1)).reshape(B * h, n_body, f, s) * scale
            if size is not None and prop_attn:
                size_flat = (
                    size.reshape(B, f, s, 1).permute(0, 2, 1, 3).reshape(B, s * f)
                )
                q_dot_k = q_dot_k.reshape(B, h, n_body, f * s) + size_flat.log()[
                    :, None, None, :
                ]
                q_dot_k = q_dot_k.reshape(B * h, n_body, f, s)
            attn = q_dot_k.softmax(dim=-1)
            v_r = v_.reshape(B * h, f, s, hd)
            xx = torch.einsum("bqfn,bfnd->bqfd", attn, v_r)
            xx = xx.reshape(B, h, n_body, f, hd).permute(0, 2, 3, 1, 4).reshape(
                B, n_body, f, d
            )
            frame_of = torch.arange(n_body) // s
            x_diag = xx[:, torch.arange(n_body), frame_of, :]
            q2 = dense(blk["attn"]["proj_q"], x_diag)
            k2, v2 = dense(blk["attn"]["proj_kv"], xx).chunk(2, dim=-1)
            q2 = q2.reshape(B, n_body, h, hd).permute(0, 2, 1, 3) * scale
            k2 = k2.reshape(B, n_body, f, h, hd).permute(0, 3, 1, 2, 4)
            attn2 = torch.einsum("bhsd,bhsfd->bhsf", q2, k2).softmax(-1)
            x_heads = xx.reshape(B, n_body, f, h, hd).permute(0, 3, 1, 2, 4)
            out = torch.einsum("bhsf,bhsfd->bhsd", attn2, x_heads)
            out = out.permute(0, 2, 1, 3).reshape(B, n_body, d)
            out = torch.cat([cls_out, out], dim=1)
            out = dense(blk["attn"]["proj"], out)
            x = x + out

            r = rs[i]
            if r > 0:
                metric = (
                    k_.reshape(B, h, s, f, hd)
                    .permute(0, 3, 1, 2, 4)
                    .reshape(B * f, h, s, hd)
                    .mean(1)
                )
                cls_tok, body = x[:, :1, :], x[:, 1:, :]
                folded = body.reshape(B, s, f, d).permute(0, 2, 1, 3).reshape(B * f, s, d)
                from torch_oracles import _reduce

                folded, size = _reduce(
                    ref_merge, metric, folded, size, r,
                    class_token=False, mode=mode, threshold=threshold,
                )
                s2 = folded.shape[1]
                body = folded.reshape(B, f, s2, d).permute(0, 2, 1, 3).reshape(
                    B, s2 * f, d
                )
                x = torch.cat([cls_tok, body], dim=1)

            xn2 = TF.layer_norm(
                x, (d,), t(blk["norm2"]["scale"]), t(blk["norm2"]["bias"]), eps=1e-6
            )
            h1 = TF.gelu(dense(blk["mlp"]["fc1"], xn2))
            x = x + dense(blk["mlp"]["fc2"], h1)

        x = TF.layer_norm(
            x, (d,), t(params["norm"]["scale"]), t(params["norm"]["bias"]), eps=1e-6
        )
        logits = dense(params["head"], x[:, 0])
        return TF.softmax(logits, dim=-1).numpy()


def test_unmerged_matches_torch_oracle():
    model, params = _init()
    video = np.random.default_rng(0).standard_normal((2, T_IN, 32, 32, 3)).astype(
        np.float32
    )
    ref = _torch_oracle(params, video)
    with jax.default_matmul_precision("highest"):
        got, _ = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_merged_matches_torch_oracle(ref_merge):
    policy = MergePolicy(rs=(1, 1), mode="merge", prop_attn=True)
    model, params = _init(policy)
    video = np.random.default_rng(1).standard_normal((2, T_IN, 32, 32, 3)).astype(
        np.float32
    )
    ref = _torch_oracle(params, video, ref_merge=ref_merge, rs=(1, 1))
    with jax.default_matmul_precision("highest"):
        got, state = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)
    # per-pseudo-frame sizes [(B*F), S - 2, 1]
    assert state.size.shape == (2 * TINY.temporal_resolution, 4 - 2, 1)


@pytest.mark.parametrize(
    "mode,threshold",
    [("drop", 0.0), ("hybrid", 0.0), ("hybrid", 0.8)],
)
def test_mode_forward_matches_torch_oracle(ref_merge, mode, threshold):
    """In-model ablation-mode parity on the '(b f) s' fold (reference
    motionformer_{drop,hybrid}, tome/patch/motionformer.py:171-227):
    class_token=False on the per-frame matcher; drop resets the folded
    size tensor to ones."""
    policy = MergePolicy(rs=(1, 1), mode=mode, threshold=threshold, prop_attn=True)
    model, params = _init(policy)
    video = np.random.default_rng(17).standard_normal(
        (2, T_IN, 32, 32, 3)
    ).astype(np.float32)
    ref = _torch_oracle(
        params, video, ref_merge=ref_merge, rs=(1, 1),
        mode=mode, threshold=threshold,
    )
    with jax.default_matmul_precision("highest"):
        got, state = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)
    assert state.size.shape == (2 * TINY.temporal_resolution, 4 - 2, 1)
    if mode == "drop":
        np.testing.assert_array_equal(np.asarray(state.size), 1.0)


def test_softmax_applied_at_inference():
    model, params = _init()
    video = np.zeros((1, T_IN, 32, 32, 3), dtype=np.float32)
    logits, _ = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(float(np.asarray(logits).sum()), 1.0, rtol=1e-5)


def test_divided_attn_matches_torch_oracle():
    """ATTN_LAYER=divided (reference motionformer_vit_helper.py:76-141,
    320-365): CLS attends globally; patch tokens attend within frame
    (space) / within spatial position (time) with the CLS key/value
    prepended to every group; time->space->MLP block order. The ToMe
    patch never touches DividedSpaceTimeBlock, so this path is always
    unmerged."""
    import dataclasses

    import torch
    import torch.nn.functional as TF

    cfg = dataclasses.replace(TINY, attn_layer="divided")
    model = Motionformer(config=cfg, policy=MergePolicy())
    video = np.random.default_rng(3).standard_normal((2, T_IN, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.key(7), jnp.asarray(video[:1]))["params"]
    with jax.default_matmul_precision("highest"):
        got, _ = model.apply({"params": params}, jnp.asarray(video))
    got = np.asarray(got)

    def t(arr):
        return torch.from_numpy(np.asarray(arr, dtype=np.float32))

    def dense(p, x):
        return TF.linear(x, t(p["kernel"]).T, t(p["bias"]) if "bias" in p else None)

    c = cfg
    h, d = c.num_heads, c.embed_dim
    hd = d // h
    f = c.temporal_resolution
    scale = hd ** -0.5

    def divided_attn(p, x, to_time):
        B, N, _ = x.shape
        qkv = dense(p["qkv"], x)
        q, k, v = qkv.chunk(3, dim=-1)
        q, k, v = (z.view(B, N, h, hd).transpose(1, 2) for z in (q, k, v))
        q = q * scale
        cls_q, q_ = q[:, :, :1], q[:, :, 1:]
        cls_k, k_ = k[:, :, :1], k[:, :, 1:]
        cls_v, v_ = v[:, :, :1], v[:, :, 1:]
        cls_out = (cls_q @ k.transpose(-2, -1)).softmax(-1) @ v
        n = N - 1
        s = n // f
        def fold(z):
            z = z.reshape(B, h, f, s, hd)
            return z.permute(0, 1, 3, 2, 4) if to_time else z
        qf, kf, vf = fold(q_), fold(k_), fold(v_)
        g = qf.shape[2]
        kf = torch.cat([cls_k[:, :, None].expand(B, h, g, 1, hd), kf], dim=3)
        vf = torch.cat([cls_v[:, :, None].expand(B, h, g, 1, hd), vf], dim=3)
        attn = torch.einsum("bhgqd,bhgkd->bhgqk", qf, kf).softmax(-1)
        out = torch.einsum("bhgqk,bhgkd->bhgqd", attn, vf)
        if to_time:
            out = out.permute(0, 1, 3, 2, 4)
        out = out.reshape(B, h, n, hd)
        out = torch.cat([cls_out, out], dim=2)
        out = out.transpose(1, 2).reshape(B, N, d)
        return dense(p["proj"], out)

    def ln(p, x):
        return TF.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps=c.layer_norm_eps)

    with torch.no_grad():
        v = t(video).permute(0, 4, 1, 2, 3)
        w3 = t(params["patch_embed_3d"]["kernel"]).permute(4, 3, 0, 1, 2)
        x = TF.conv3d(
            v, w3, t(params["patch_embed_3d"]["bias"]),
            stride=(c.patch_size_temp, c.patch_size, c.patch_size),
        )
        x = x.flatten(2).transpose(1, 2)  # (f n) frame-major
        B = x.shape[0]
        cls = t(params["cls_token"]).expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        pos = t(params["pos_embed"])
        npatch = c.spatial_tokens
        # separate pos embed: cls + tile spatial over frames + temp per frame
        tile = pos[:, 1:, :].repeat(1, f, 1)
        temp = t(params["temp_embed"]).repeat_interleave(npatch, dim=1)
        x = x + torch.cat([pos[:, :1, :], tile + temp], dim=1)
        for i in range(c.depth):
            p = params[f"blocks_{i}"]
            x = x + divided_attn(p["timeattn"], ln(p["norm3"], x), to_time=True)
            x = x + divided_attn(p["attn"], ln(p["norm1"], x), to_time=False)
            y = TF.gelu(dense(p["mlp"]["fc1"], ln(p["norm2"], x)))
            x = x + dense(p["mlp"]["fc2"], y)
        x = ln(params["norm"], x)
        logits = dense(params["head"], x[:, 0])
        probs = logits.softmax(-1).numpy()  # inference applies softmax

    np.testing.assert_allclose(got, probs, rtol=2e-4, atol=2e-4)
