"""Torch-checkpoint -> JAX pytree converters.

One-way importers for the pretrained weights the reference consumes
(SURVEY.md §5 checkpoint/resume): the reference loads `.pyth` files
with a ``model_state`` dict and also "foreign" checkpoints — VideoMAE
(`module.*` prefixes) and HF bare state dicts
(slowfast/utils/checkpoint.py:303-311). We accept all of these plus
HuggingFace model naming, normalise to the original (MCG-NJU / HF)
key space, and emit flax param trees matching vtm's modules.

All converters are pure dict->dict transforms over numpy arrays; torch
is only needed to deserialise ``.pyth``/``.pth`` files.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional

import numpy as np

from vtm.utils.logging import get_logger

logger = get_logger(__name__)


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file and return a flat name->numpy dict.
    Handles the reference's `.pyth` layout ({'model_state': ...}) and
    bare state dicts (checkpoint.py:295-311)."""
    import torch

    # weights_only guards against pickle code execution in third-party
    # checkpoints (the reference's torch branch passes it too); fall
    # back for legacy files that pickle non-tensor objects
    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        logger.warning(
            "%s: weights_only load failed, retrying with full pickle", path
        )
        blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict):
        # 'module' is the DeepSpeed/MCG-NJU VideoMAE container
        # (reference checkpoint.py:303-311)
        for key in ("model_state", "model", "state_dict", "module"):
            if key in blob and isinstance(blob[key], dict):
                blob = blob[key]
                break
    # DDP-saved state dicts carry a leading 'module.' on every key; the
    # reference strips it at load time for all checkpoints
    # (checkpoint.py:295-311), BEFORE any model-specific conversion —
    # some converters key off the first path component (e.g. HF
    # 'videomae.*' detection), so this must happen here, not in them.
    return {
        k[len("module."):] if k.startswith("module.") else k: _np(v)
        for k, v in blob.items()
    }


def strip_prefixes(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove wrapper prefixes: 'module.', 'model.', 'backbone.'."""
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "model.", "backbone."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def _dense(sd, name):
    p = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def _layernorm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _conv3d(sd, name):
    # torch [D, C, kt, kh, kw] -> flax [kt, kh, kw, C, D]
    p = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def _conv2d(sd, name):
    # torch [D, C, kh, kw] -> flax [kh, kw, C, D]
    p = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


# --------------------------------------------------------------------- VideoMAE


def _hf_videomae_to_original(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HuggingFace VideoMAEForVideoClassification names -> original
    MCG-NJU names (fusing separate q/k/v back into qkv)."""
    out = {}
    layer_re = re.compile(r"^videomae\.encoder\.layer\.(\d+)\.")
    fused: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        v = _np(v)
        if k.startswith("videomae.embeddings.patch_embeddings.projection."):
            out["patch_embed.proj." + k.rsplit(".", 1)[1]] = v
        elif k == "fc_norm.weight":
            out["fc_norm.weight"] = v
        elif k == "fc_norm.bias":
            out["fc_norm.bias"] = v
        elif k == "videomae.layernorm.weight":
            out["norm.weight"] = v
        elif k == "videomae.layernorm.bias":
            out["norm.bias"] = v
        elif k.startswith("classifier."):
            out["head." + k.split(".", 1)[1]] = v
        elif layer_re.match(k):
            i = int(layer_re.match(k).group(1))
            rest = layer_re.sub("", k)
            pre = f"blocks.{i}."
            if rest.endswith("attention.attention.q_bias"):
                out[pre + "attn.q_bias"] = v
            elif rest.endswith("attention.attention.v_bias"):
                out[pre + "attn.v_bias"] = v
            elif rest in (
                "attention.attention.query.weight",
                "attention.attention.key.weight",
                "attention.attention.value.weight",
            ):
                fused.setdefault(i, {})[rest.split(".")[-2]] = v
            elif rest.startswith("attention.output.dense."):
                out[pre + "attn.proj." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("intermediate.dense."):
                out[pre + "mlp.fc1." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("output.dense."):
                out[pre + "mlp.fc2." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("layernorm_before."):
                out[pre + "norm1." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("layernorm_after."):
                out[pre + "norm2." + rest.rsplit(".", 1)[1]] = v
    for i, qkv in fused.items():
        out[f"blocks.{i}.attn.qkv.weight"] = np.concatenate(
            [qkv["query"], qkv["key"], qkv["value"]], axis=0
        )
    return out


def convert_videomae(sd: Mapping[str, np.ndarray], depth: int) -> dict:
    """Original VideoMAE state dict -> vtm.models.videomae.VideoMAE params.

    Accepts HF naming too (auto-detected). Reference loading quirks
    handled upstream by :func:`strip_prefixes` / :func:`load_torch_state_dict`.
    """
    if any(k.startswith("videomae.") for k in sd):
        sd = _hf_videomae_to_original(sd)
    sd = strip_prefixes(sd)

    params: dict = {"patch_embed": _conv3d(sd, "patch_embed.proj")}
    for i in range(depth):
        pre = f"blocks.{i}"
        block: dict = {
            "norm1": _layernorm(sd, f"{pre}.norm1"),
            "norm2": _layernorm(sd, f"{pre}.norm2"),
            "attn": {
                "qkv": {"kernel": _np(sd[f"{pre}.attn.qkv.weight"]).T},
                "proj": _dense(sd, f"{pre}.attn.proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                "fc2": _dense(sd, f"{pre}.mlp.fc2"),
            },
        }
        if f"{pre}.attn.q_bias" in sd:
            block["attn"]["q_bias"] = _np(sd[f"{pre}.attn.q_bias"])
            block["attn"]["v_bias"] = _np(sd[f"{pre}.attn.v_bias"])
        if f"{pre}.gamma_1" in sd:
            block["gamma_1"] = _np(sd[f"{pre}.gamma_1"])
            block["gamma_2"] = _np(sd[f"{pre}.gamma_2"])
        params[f"blocks_{i}"] = block

    if "fc_norm.weight" in sd:
        params["fc_norm"] = _layernorm(sd, "fc_norm")
    if "norm.weight" in sd:
        params["norm"] = _layernorm(sd, "norm")
    if "head.weight" in sd:
        params["head"] = _dense(sd, "head")
    for h in range(4):
        if f"head{h}.weight" in sd:
            params[f"head{h}"] = _dense(sd, f"head{h}")
    return params


# ----------------------------------------------------------------------- ViViT


def convert_vivit(sd: Mapping[str, np.ndarray], depth: int) -> dict:
    """HF/reference ViViT state dict -> vtm.models.vivit.ViViT params.

    Accepts both the reference wrapper layout (vivit.* + classifier /
    verb_classifier+noun_classifier; vivit_video_model_builder.py:22-28)
    and HF VivitForVideoClassification (vivit.* + classifier)."""
    sd = {k: _np(v) for k, v in sd.items()}
    params: dict = {
        "patch_embed": _conv3d(sd, "vivit.embeddings.patch_embeddings.projection"),
        "cls_token": sd["vivit.embeddings.cls_token"],
        "position_embeddings": sd["vivit.embeddings.position_embeddings"],
        "layernorm": _layernorm(sd, "vivit.layernorm"),
    }
    for i in range(depth):
        pre = f"vivit.encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "layernorm_before": _layernorm(sd, f"{pre}.layernorm_before"),
            "layernorm_after": _layernorm(sd, f"{pre}.layernorm_after"),
            "attention": {
                "query": _dense(sd, f"{pre}.attention.attention.query"),
                "key": _dense(sd, f"{pre}.attention.attention.key"),
                "value": _dense(sd, f"{pre}.attention.attention.value"),
            },
            "attention_output": _dense(sd, f"{pre}.attention.output.dense"),
            "intermediate": _dense(sd, f"{pre}.intermediate.dense"),
            "output": _dense(sd, f"{pre}.output.dense"),
        }
    for name in ("classifier", "verb_classifier", "noun_classifier"):
        if f"{name}.weight" in sd:
            params[name] = _dense(sd, name)
    return params


# ------------------------------------------------------------------ TimeSformer


def _interp_tokens_nearest(emb: np.ndarray, new_len: int) -> np.ndarray:
    """1-D nearest interpolation over the token axis of [1, N, D]
    (the reference's pos/time-embed resize uses F.interpolate
    mode='nearest' — timesformer.py:262-293, helpers:169-183)."""
    n = emb.shape[1]
    if n == new_len:
        return emb
    # torch F.interpolate nearest: src_idx = floor(dst_idx * n / new_len)
    idx = np.floor(np.arange(new_len) * n / new_len).astype(np.int64)
    return emb[:, idx, :]


def _hf_timesformer_to_original(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF TimesformerForVideoClassification names -> original
    facebookresearch/TimeSformer names."""
    out = {}
    layer_re = re.compile(r"^timesformer\.encoder\.layer\.(\d+)\.")
    for k, v in sd.items():
        v = _np(v)
        if k == "timesformer.embeddings.cls_token":
            out["cls_token"] = v
        elif k == "timesformer.embeddings.position_embeddings":
            out["pos_embed"] = v
        elif k == "timesformer.embeddings.time_embeddings":
            out["time_embed"] = v
        elif k.startswith("timesformer.embeddings.patch_embeddings.projection."):
            out["patch_embed.proj." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("timesformer.layernorm."):
            out["norm." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("classifier."):
            out["head." + k.split(".", 1)[1]] = v
        elif layer_re.match(k):
            i = int(layer_re.match(k).group(1))
            rest = layer_re.sub("", k)
            pre = f"blocks.{i}."
            mapping = {
                "attention.attention.qkv.": "attn.qkv.",
                "attention.output.dense.": "attn.proj.",
                "temporal_attention.attention.qkv.": "temporal_attn.qkv.",
                "temporal_attention.output.dense.": "temporal_attn.proj.",
                "temporal_dense.": "temporal_fc.",
                "layernorm_before.": "norm1.",
                "temporal_layernorm.": "temporal_norm1.",
                "layernorm_after.": "norm2.",
                "intermediate.dense.": "mlp.fc1.",
                "output.dense.": "mlp.fc2.",
            }
            for hf_pre, orig_pre in mapping.items():
                if rest.startswith(hf_pre):
                    out[pre + orig_pre + rest[len(hf_pre):]] = v
                    break
    return out


def convert_timesformer(
    sd: Mapping[str, np.ndarray],
    depth: int,
    num_frames: Optional[int] = None,
    spatial_tokens: Optional[int] = None,
) -> dict:
    """Original TimeSformer (or HF) state dict -> vtm TimeSformer params.

    Handles pos/time-embed token-count mismatches by nearest
    interpolation (reference timesformer.py:262-293) and clones spatial
    attention into missing temporal attention weights, zero-initialising
    temporal_fc — the ImageNet-init rule (timesformer_helpers.py:185-201).
    """
    if any(k.startswith("timesformer.") for k in sd):
        sd = _hf_timesformer_to_original(sd)
    sd = dict(strip_prefixes(sd))

    pos = _np(sd["pos_embed"])
    if spatial_tokens is not None and pos.shape[1] != spatial_tokens + 1:
        cls_pos, body = pos[:, :1], pos[:, 1:]
        pos = np.concatenate(
            [cls_pos, _interp_tokens_nearest(body, spatial_tokens)], axis=1
        )
    params: dict = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": pos,
        "patch_embed": _conv2d(sd, "patch_embed.proj"),
        "norm": _layernorm(sd, "norm"),
    }
    if "time_embed" in sd:
        te = _np(sd["time_embed"])
        if num_frames is not None and te.shape[1] != num_frames:
            te = _interp_tokens_nearest(te, num_frames)
        params["time_embed"] = te

    for i in range(depth):
        pre = f"blocks.{i}"
        block = {
            "norm1": _layernorm(sd, f"{pre}.norm1"),
            "norm2": _layernorm(sd, f"{pre}.norm2"),
            "attn": {
                "qkv": _dense(sd, f"{pre}.attn.qkv"),
                "proj": _dense(sd, f"{pre}.attn.proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                "fc2": _dense(sd, f"{pre}.mlp.fc2"),
            },
        }
        if f"{pre}.temporal_attn.qkv.weight" in sd:
            block["temporal_norm1"] = _layernorm(sd, f"{pre}.temporal_norm1")
            block["temporal_attn"] = {
                "qkv": _dense(sd, f"{pre}.temporal_attn.qkv"),
                "proj": _dense(sd, f"{pre}.temporal_attn.proj"),
            }
            block["temporal_fc"] = _dense(sd, f"{pre}.temporal_fc")
        elif f"{pre}.attn.qkv.weight" in sd:
            # image-ViT init: temporal attn copies spatial, temporal_fc=0
            block["temporal_norm1"] = _layernorm(sd, f"{pre}.norm1")
            block["temporal_attn"] = {
                "qkv": _dense(sd, f"{pre}.attn.qkv"),
                "proj": _dense(sd, f"{pre}.attn.proj"),
            }
            d = block["attn"]["proj"]["kernel"].shape[0]
            block["temporal_fc"] = {
                "kernel": np.zeros((d, d), np.float32),
                "bias": np.zeros((d,), np.float32),
            }
        params[f"blocks_{i}"] = block

    if "head.weight" in sd:
        params["head"] = _dense(sd, "head")
    for h in range(4):
        if f"head{h}.weight" in sd:
            params[f"head{h}"] = _dense(sd, f"head{h}")
    return params


# ----------------------------------------------------------------- Motionformer


def convert_motionformer(sd: Mapping[str, np.ndarray], depth: int) -> dict:
    """Motionformer state dict -> vtm Motionformer params
    (builder: motionformer_video_model_builder.py:25-283)."""
    sd = dict(strip_prefixes({k: _np(v) for k, v in sd.items()}))
    params: dict = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": _layernorm(sd, "norm"),
    }
    if "temp_embed" in sd:
        params["temp_embed"] = sd["temp_embed"]
    if "st_embed" in sd:
        params["st_embed"] = sd["st_embed"]
    if "patch_embed_3d.proj.weight" in sd:
        params["patch_embed_3d"] = _conv3d(sd, "patch_embed_3d.proj")
    if "patch_embed.proj.weight" in sd:
        params["patch_embed"] = _conv2d(sd, "patch_embed.proj")
    for i in range(depth):
        pre = f"blocks.{i}"
        attn = {
            "qkv": _dense(sd, f"{pre}.attn.qkv"),
            "proj": _dense(sd, f"{pre}.attn.proj"),
        }
        if f"{pre}.attn.proj_q.weight" in sd:
            attn["proj_q"] = _dense(sd, f"{pre}.attn.proj_q")
            attn["proj_kv"] = _dense(sd, f"{pre}.attn.proj_kv")
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{pre}.norm1"),
            "norm2": _layernorm(sd, f"{pre}.norm2"),
            "attn": attn,
            "mlp": {
                "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                "fc2": _dense(sd, f"{pre}.mlp.fc2"),
            },
        }
        # divided space-time blocks carry a second attention + norm3
        # (motionformer_vit_helper.py:320-351)
        if f"{pre}.timeattn.qkv.weight" in sd:
            params[f"blocks_{i}"]["timeattn"] = {
                "qkv": _dense(sd, f"{pre}.timeattn.qkv"),
                "proj": _dense(sd, f"{pre}.timeattn.proj"),
            }
            params[f"blocks_{i}"]["norm3"] = _layernorm(sd, f"{pre}.norm3")
    if "pre_logits.fc.weight" in sd:
        params["pre_logits_fc"] = _dense(sd, "pre_logits.fc")
    if "head.weight" in sd:
        params["head"] = _dense(sd, "head")
    for h in range(4):
        if f"head{h}.weight" in sd:
            params[f"head{h}"] = _dense(sd, f"head{h}")
    return params


def convert_pyslowfast(sd: Mapping[str, np.ndarray], num_splits: int = 1) -> tuple:
    """PySlowFast conv-family state dict (SlowFast/ResNet/X3D `.pyth`)
    -> (params, batch_stats) flax trees.

    vtm's conv modules (vtm/models/{convnet,slowfast}.py) keep the
    reference module names (`s1.pathway0_stem.conv`, `s4.pathway0_res2.
    branch2.a_bn`, `head.projection`, ...), so conversion is purely
    structural: conv kernels transpose OIDHW->DHWIO, linear weights
    transpose, BN affine/running stats split into params/batch_stats
    (reference slowfast/utils/checkpoint.py:191-302 torch load path).
    SubBatchNorm modules (`X.bn` + `X.split_bn` children,
    batchnorm_helper.py:40-112) fold into one vtm BatchNorm with
    `split_mean/split_var` stats of shape [num_splits, C].
    """
    params: dict = {}
    stats: dict = {}

    # SSL MLP heads (head_helper.py MLPHead): torch Sequential indices
    # `head.projection.projection.{i}` / `head.predictors.{j}.projection.{i}`
    # -> flax `head/projection/fc{k}` (+`bn{k}`) / `head/predictors_{j}/...`
    def rename_mlp(key: str) -> str:
        m = re.match(
            r"(.*?(?:projection|predictors\.(\d+)))\.projection\.(\d+)\.(.*)",
            key,
        )
        if not m:
            return key
        base, pred_i, idx, rest = (
            m.group(1), m.group(2), int(m.group(3)), m.group(4),
        )
        bn_on = f"{base}.projection.1.running_mean" in sd
        stride = 3 if bn_on else 2
        if idx % stride == 0:
            sub = f"fc{idx // stride}"
        elif bn_on and idx % stride == 1:
            sub = f"bn{(idx + 2) // 3}"
        else:  # ReLU — no params
            return key
        if pred_i is not None:
            base = base.replace(f"predictors.{pred_i}", f"predictors_{pred_i}")
        return f"{base}.{sub}.{rest}"

    sd = {rename_mlp(k): v for k, v in sd.items()}

    def put(tree, path, leaf, value):
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf] = value

    def is_subbn(mod):
        # SubBatchNorm3d wrapper: has a `split_bn` child
        return ".".join(mod + ["split_bn", "running_mean"]) in sd

    for key, v in sd.items():
        v = _np(v)
        parts = key.split(".")
        mod, leaf = parts[:-1], parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if leaf in ("running_mean", "running_var"):
            name = "mean" if leaf == "running_mean" else "var"
            if mod and mod[-1] == "split_bn":
                put(stats, mod[:-1], f"split_{name}", v.reshape(num_splits, -1))
            elif mod and mod[-1] == "bn" and is_subbn(mod[:-1]):
                put(stats, mod[:-1], name, v)  # SubBN inner eval stats
            else:
                put(stats, mod, name, v)
            continue
        if leaf == "weight":
            if v.ndim == 5:  # conv3d OIDHW -> DHWIO
                put(params, mod, "kernel", v.transpose(2, 3, 4, 1, 0))
            elif v.ndim == 2:  # linear
                put(params, mod, "kernel", v.T)
            else:  # BN affine (SubBN keeps affine on the wrapper itself)
                put(params, mod, "scale", v)
            continue
        if leaf == "bias":
            put(params, mod, "bias", v)
            continue
    return params, stats


def convert_mvit(sd: Mapping[str, np.ndarray], depth: int) -> dict:
    """MViT state dict -> vtm MViTModel params
    (builder: video_model_builder.py:809-1267 + attention.py)."""
    sd = dict(strip_prefixes({k: _np(v) for k, v in sd.items()}))
    params: dict = {}
    if "norm.weight" in sd:  # MaskMViT deletes the final norm/head
        params["norm"] = _layernorm(sd, "norm")
    for key in ("cls_token", "pos_embed", "pos_embed_spatial",
                "pos_embed_temporal", "pos_embed_class", "mask_token",
                "decoder_pos_embed", "dec_pos_embed_spatial",
                "dec_pos_embed_temporal", "dec_pos_embed_class"):
        if key in sd:
            params[key] = sd[key]
    if "decoder_embed.weight" in sd:  # MAE branch (masked.py:87)
        params["decoder_embed"] = _dense(sd, "decoder_embed")
    params["patch_embed"] = _conv3d(sd, "patch_embed.proj")
    if "norm_stem.weight" in sd:
        params["norm_stem"] = _layernorm(sd, "norm_stem")
    for i in range(depth):
        pre = f"blocks.{i}"
        if f"{pre}.norm1.weight" not in sd:
            continue  # REV checkpoints have no plain blocks
        params[f"blocks_{i}"] = _mvit_block(sd, pre)

    # ---- reversible encoder layout (MVIT.REV,
    # reference reversible_mvit.py: rev_backbone.layers.{i}.{F,G,res_proj})
    rev: dict = {}
    i = 0
    while f"rev_backbone.layers.{i}.F.norm.weight" in sd:
        lpre = f"rev_backbone.layers.{i}"
        layer = {
            "F": {
                "norm": _layernorm(sd, f"{lpre}.F.norm"),
                "attn": _mvit_attn(sd, f"{lpre}.F"),
            },
            "G": {
                "norm": _layernorm(sd, f"{lpre}.G.norm"),
                "mlp": {
                    "fc1": _dense(sd, f"{lpre}.G.mlp.fc1"),
                    "fc2": _dense(sd, f"{lpre}.G.mlp.fc2"),
                },
            },
        }
        if f"{lpre}.res_proj.weight" in sd:
            layer["res_proj"] = _dense(sd, f"{lpre}.res_proj")
        if f"{lpre}.pre_q_fuse.fuse_fn.fc1.weight" in sd:
            layer["pre_q_fuse"] = {"mlp": {
                "fc1": _dense(sd, f"{lpre}.pre_q_fuse.fuse_fn.fc1"),
                "fc2": _dense(sd, f"{lpre}.pre_q_fuse.fuse_fn.fc2"),
            }}
        rev[f"layers_{i}"] = layer
        i += 1
    if rev:
        params["rev_backbone"] = rev
    # RESPATH_FUSE with params (concat_linear / ln+concat_linear)
    if "fuse.fuse_fn.fc1.weight" in sd:
        params["fuse"] = {"mlp": {
            "fc1": _dense(sd, "fuse.fuse_fn.fc1"),
            "fc2": _dense(sd, "fuse.fuse_fn.fc2"),
        }}
    elif "fuse.fuse_fn.0.weight" in sd:
        params["fuse"] = {
            "ln": _layernorm(sd, "fuse.fuse_fn.0"),
            "mlp": {
                "fc1": _dense(sd, "fuse.fuse_fn.1.fc1"),
                "fc2": _dense(sd, "fuse.fuse_fn.1.fc2"),
            },
        }

    if "head.projection.weight" in sd:
        params["head"] = _dense(sd, "head.projection")
    return params


def _mvit_block(sd: Mapping[str, np.ndarray], pre: str) -> dict:
    """One MultiScaleBlock's weights under ``pre`` -> flax subtree."""
    blk = {
        "norm1": _layernorm(sd, f"{pre}.norm1"),
        "norm2": _layernorm(sd, f"{pre}.norm2"),
        "attn": _mvit_attn(sd, pre),
        "mlp": {
            "fc1": _dense(sd, f"{pre}.mlp.fc1"),
            "fc2": _dense(sd, f"{pre}.mlp.fc2"),
        },
    }
    if f"{pre}.proj.weight" in sd:
        blk["proj"] = _dense(sd, f"{pre}.proj")
    for g in ("gamma_1", "gamma_2"):
        if f"{pre}.{g}" in sd:
            blk[g] = sd[f"{pre}.{g}"]
    return blk


def convert_maskmvit(sd: Mapping[str, np.ndarray], depth: int) -> dict:
    """MaskMViT / MAE state dict -> vtm params: the MViT trunk via
    :func:`convert_mvit` plus the MSSeparateHead layout
    (pred_head.transforms.{i}.{j} Sequential -> transforms_{i}_{j}
    blocks + transform_norm_{i} + projections_{i};
    reference head_helper.py:449-560)."""
    # one normalisation pass for the head keys below; convert_mvit's
    # internal re-normalisation is a no-op on numpy values (_np returns
    # ndarray inputs unchanged)
    sd = dict(strip_prefixes({k: _np(v) for k, v in sd.items()}))
    params = convert_mvit(sd, depth)
    head: dict = {}
    i = 0
    while f"pred_head.projections.{i}.weight" in sd:
        j = 0
        while f"pred_head.transforms.{i}.{j}.norm1.weight" in sd:
            head[f"transforms_{i}_{j}"] = _mvit_block(
                sd, f"pred_head.transforms.{i}.{j}"
            )
            j += 1
        head[f"transform_norm_{i}"] = _layernorm(
            sd, f"pred_head.transforms.{i}.{j}"
        )
        head[f"projections_{i}"] = _dense(sd, f"pred_head.projections.{i}")
        i += 1
    if head:
        params["pred_head"] = head
    return params


def _mvit_attn(sd: Mapping[str, np.ndarray], pre: str) -> dict:
    """MultiScaleAttention weights under ``{pre}.attn`` -> flax subtree
    (shared by the plain-block and reversible layouts)."""
    attn: dict = {"proj": _dense(sd, f"{pre}.attn.proj")}
    if f"{pre}.attn.qkv.weight" in sd:
        attn["qkv"] = _dense(sd, f"{pre}.attn.qkv")
    for nm in ("q", "k", "v"):
        if f"{pre}.attn.{nm}.weight" in sd:
            attn[nm] = _dense(sd, f"{pre}.attn.{nm}")
    for nm in ("q", "k", "v"):
        mod = {}
        if f"{pre}.attn.pool_{nm}.weight" in sd:
            w = sd[f"{pre}.attn.pool_{nm}.weight"]  # [C,1,kt,kh,kw]
            mod["pool"] = {"kernel": w.transpose(2, 3, 4, 1, 0)}
        if f"{pre}.attn.norm_{nm}.weight" in sd:
            mod["norm"] = _layernorm(sd, f"{pre}.attn.norm_{nm}")
        if mod:
            attn[f"pool_{nm}_mod"] = mod
    for nm in ("rel_pos_h", "rel_pos_w", "rel_pos_t"):
        if f"{pre}.attn.{nm}" in sd:
            attn[nm] = sd[f"{pre}.attn.{nm}"]
    return attn


def caffe2_name_to_pytorch(name: str) -> str:
    """Caffe2 blob name -> PySlowFast module path (reference
    slowfast/utils/c2_model_loading.py:9-123 — the same regex table,
    applied in order)."""
    pairs = [
        [r"^nonlocal_conv([0-9]+)_([0-9]+)_(.*)", r"s\1.pathway0_nonlocal\2_\3"],
        [r"^(.*)_nonlocal([0-9]+)_(theta)(.*)", r"\1_nonlocal\2.conv_\3\4"],
        [r"^(.*)_nonlocal([0-9]+)_(g)(.*)", r"\1_nonlocal\2.conv_\3\4"],
        [r"^(.*)_nonlocal([0-9]+)_(phi)(.*)", r"\1_nonlocal\2.conv_\3\4"],
        [r"^(.*)_nonlocal([0-9]+)_(out)(.*)", r"\1_nonlocal\2.conv_\3\4"],
        [r"^(.*)_nonlocal([0-9]+)_(bn)_(.*)", r"\1_nonlocal\2.\3.\4"],
        [r"^t_pool1_subsample_bn_(.*)", r"s1_fuse.bn.\1"],
        [r"^t_pool1_subsample_(.*)", r"s1_fuse.conv_f2s.\1"],
        [r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_bn_(.*)", r"s\1_fuse.bn.\3"],
        [r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_(.*)", r"s\1_fuse.conv_f2s.\3"],
        [
            r"^res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
            r"s\1.pathway0_res\2.branch\3.\4_\5",
        ],
        [r"^res_conv1_bn_(.*)", r"s1.pathway0_stem.bn.\1"],
        [r"^conv1_xy(.*)", r"s1.pathway0_stem.conv_xy\1"],
        [r"^conv1_(.*)", r"s1.pathway0_stem.conv.\1"],
        [
            r"^res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
            r"s\1.pathway0_res\2.branch\3_\4",
        ],
        [r"^res_conv1_(.*)", r"s1.pathway0_stem.conv.\1"],
        [
            r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
            r"s\1.pathway1_res\2.branch\3.\4_\5",
        ],
        [r"^t_res_conv1_bn_(.*)", r"s1.pathway1_stem.bn.\1"],
        [r"^t_conv1_(.*)", r"s1.pathway1_stem.conv.\1"],
        [
            r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
            r"s\1.pathway1_res\2.branch\3_\4",
        ],
        [r"^t_res_conv1_(.*)", r"s1.pathway1_stem.conv.\1"],
        [r"pred_(.*)", r"head.projection.\1"],
        [r"(.*)b_bn_fc(.*)", r"\1se.fc\2"],
        [r"conv_5(.*)", r"head.conv_5\1"],
        [r"lin_5(.*)", r"head.lin_5\1"],
        [r"(.*)bn.b\Z", r"\1bn.bias"],
        [r"(.*)bn.s\Z", r"\1bn.weight"],
        [r"(.*)bn.rm\Z", r"\1bn.running_mean"],
        [r"(.*)bn.riv\Z", r"\1bn.running_var"],
        [r"(.*)[\._]b\Z", r"\1.bias"],
        [r"(.*)[\._]w\Z", r"\1.weight"],
    ]
    for source, dest in pairs:
        name = re.sub(source, dest, name)
    return name


def convert_caffe2(blobs: Mapping[str, np.ndarray], num_splits: int = 1) -> tuple:
    """Caffe2 blob dict -> (params, batch_stats) flax trees for the conv
    families: regex-rename then the structural convert_pyslowfast
    (reference checkpoint.py caffe2 branch, :191-302)."""
    sd = {}
    for key, value in blobs.items():
        if "momentum" in key or key in ("model_iter", "lr"):
            continue
        sd[caffe2_name_to_pytorch(key)] = np.asarray(value)
    return convert_pyslowfast(sd, num_splits=num_splits)
