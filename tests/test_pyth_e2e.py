"""File-level `.pyth` end-to-end tests for the four ToMe backbones
(VERDICT-r4 missing item 2): torch.save a state dict in the released
wrapper formats the reference loader accepts (slowfast/utils/
checkpoint.py:303-311 — bare dict, {'model_state': ...}, {'module':
...} containers, DDP 'module.'-prefixed keys), then drive the REAL
`tools/test_net.py` path from TEST.CHECKPOINT_FILE_PATH through the
multi-view loop to ensembled per-video decisions, and compare against
the torch source model run host-side on the SAME loader clips with the
reference ensembling protocol (sum over views — TestMeter parity is
covered by tests/test_driver_parity.py).

This closes the offline-closable slice of the real-weights risk: the
converter tests prove module-level logits parity; these prove the
file → converter → driver → meter chain at the released formats.
"""

from __future__ import annotations

import pathlib
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from vtm.config import assert_and_infer_cfg, get_cfg

torch = pytest.importorskip("torch")


# --------------------------------------------------------------- helpers


def _base_cfg(tmp_path, opts):
    cfg = get_cfg()
    cfg.merge_from_list(
        [
            "MODEL.NUM_CLASSES", "5",
            "DATA.NUM_FRAMES", "4",
            "DATA.TRAIN_CROP_SIZE", "32",
            "DATA.TEST_CROP_SIZE", "32",
            "TEST.DATASET", "synthetic",
            "TEST.BATCH_SIZE", "4",
            "TEST.NUM_ENSEMBLE_VIEWS", "2",
            "TEST.NUM_SPATIAL_CROPS", "1",
            "TPU.COMPUTE_DTYPE", "float32",
            "DATA_LOADER.NUM_WORKERS", "0",
            "TEST.SAVE_RESULTS_PATH", str(tmp_path / "preds.pkl"),
            "OUTPUT_DIR", str(tmp_path),
        ]
        + opts
    )
    return assert_and_infer_cfg(cfg)


def _run_driver(cfg, tmp_path):
    from tools.test_net import test as run_test

    run_test(cfg)
    with open(tmp_path / "preds.pkl", "rb") as f:
        out = pickle.load(f)
    return np.asarray(out["preds"]), np.asarray(out["labels"])


def _expected_from_torch(cfg, forward):
    """Host-side reference protocol: run ``forward`` (clip [B,T,H,W,C]
    float32 -> per-clip scores) over the same test loader stream and
    sum-ensemble per video (reference TestMeter, meters.py:259-441)."""
    from vtm.data import construct_loader

    loader = construct_loader(cfg, "test")
    num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    num_videos = len(loader.dataset) // num_clips
    preds = np.zeros((num_videos, cfg.MODEL.NUM_CLASSES), np.float32)
    labels = np.zeros(num_videos, np.int64)
    for batch in loader:
        scores = forward(np.asarray(batch["frames"], np.float32))
        for j, idx in enumerate(np.asarray(batch["index"])):
            vid = int(idx) // num_clips
            preds[vid] += scores[j]
            labels[vid] = int(np.asarray(batch["label"])[j])
    return preds, labels


def _hf_forward(hf):
    def forward(frames):
        with torch.no_grad():
            return (
                hf(torch.from_numpy(frames).permute(0, 1, 4, 2, 3))
                .logits.numpy()
            )

    return forward


def _check(got, exp, got_labels, exp_labels, tol=1e-3):
    np.testing.assert_array_equal(got_labels, exp_labels)
    np.testing.assert_array_equal(np.argmax(got, 1), np.argmax(exp, 1))
    np.testing.assert_allclose(got, exp, rtol=tol, atol=tol)


def _inv_dense(sd, prefix, p):
    """flax dense {kernel,bias} -> torch '{prefix}.weight/.bias'."""
    sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["kernel"]).T.copy())
    if "bias" in p:
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())


def _inv_layernorm(sd, prefix, p):
    """flax layernorm {scale,bias} -> torch '{prefix}.weight/.bias'."""
    sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["scale"]).copy())
    sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())


# --------------------------------------------------------------- VideoMAE


def test_videomae_pyth_module_container(tmp_path):
    """HF-named VideoMAE weights in the MCG-NJU ``{'module': sd}``
    container (reference checkpoint.py:303-311), through the driver at
    the vit_small variant geometry."""
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEForVideoClassification

    torch.manual_seed(0)
    hf = VideoMAEForVideoClassification(
        HFConfig(
            image_size=32, patch_size=16, num_frames=4, tubelet_size=2,
            hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
            intermediate_size=1536, num_labels=5, use_mean_pooling=True,
        )
    ).eval()
    path = tmp_path / "videomae_vits.pyth"
    torch.save({"module": hf.state_dict()}, path)

    cfg = _base_cfg(
        tmp_path,
        [
            "MODEL.MODEL_NAME", "VideoMAE",
            "VIDEOMAE.MODEL", "vit_small_patch16_224",
            "VIDEOMAE.TUBELET_SIZE", "2",
            "TEST.CHECKPOINT_FILE_PATH", str(path),
        ],
    )
    got, got_labels = _run_driver(cfg, tmp_path)
    exp, exp_labels = _expected_from_torch(cfg, _hf_forward(hf))
    _check(got, exp, got_labels, exp_labels)


# ----------------------------------------------------------------- ViViT


def _vivit_cfg(tmp_path, ckpt_path):
    import json

    conf = {
        "video_size": [4, 32, 32],
        "tubelet_size": [2, 16, 16],
        "num_channels": 3,
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 2,
        "intermediate_size": 64,
        "hidden_act": "gelu_fast",
        "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0,
        "initializer_range": 0.02,
        "layer_norm_eps": 1e-6,
        "qkv_bias": True,
    }
    p = tmp_path / "vivit.json"
    p.write_text(json.dumps(conf))
    return _base_cfg(
        tmp_path,
        [
            "MODEL.MODEL_NAME", "ViViT",
            "VIVIT.CONFIG_PATH", str(p),
            "TEST.CHECKPOINT_FILE_PATH", str(ckpt_path),
        ],
    )


def _hf_vivit():
    from transformers import VivitConfig as HFConfig
    from transformers import VivitForVideoClassification

    torch.manual_seed(0)
    hf = VivitForVideoClassification(
        HFConfig(
            image_size=32, num_frames=4, tubelet_size=[2, 16, 16],
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, hidden_act="gelu_fast", num_labels=5,
            attn_implementation="eager",
        )
    ).eval()
    torch.nn.init.normal_(hf.vivit.embeddings.cls_token, std=0.5)
    torch.nn.init.normal_(hf.vivit.embeddings.position_embeddings, std=0.5)
    return hf


def test_vivit_pyth_bare_dict(tmp_path):
    hf = _hf_vivit()
    path = tmp_path / "vivit.pyth"
    torch.save(hf.state_dict(), path)
    cfg = _vivit_cfg(tmp_path, path)
    got, got_labels = _run_driver(cfg, tmp_path)
    exp, exp_labels = _expected_from_torch(cfg, _hf_forward(hf))
    _check(got, exp, got_labels, exp_labels, tol=1e-4)


def test_vivit_pyth_wrapper_formats_agree(tmp_path):
    """The same weights saved as bare dict / {'model_state'} /
    {'module'} / DDP 'module.'-prefixed keys must produce IDENTICAL
    driver predictions (reference checkpoint.py:295-311 accepts all)."""
    hf = _hf_vivit()
    sd = hf.state_dict()
    variants = {
        "bare.pyth": sd,
        "model_state.pyth": {"model_state": sd, "epoch": 3},
        "module.pyth": {"module": sd},
        "ddp.pyth": {"model_state": {f"module.{k}": v for k, v in sd.items()}},
    }
    results = {}
    for name, blob in variants.items():
        path = tmp_path / name
        torch.save(blob, path)
        cfg = _vivit_cfg(tmp_path, path)
        results[name], _ = _run_driver(cfg, tmp_path)
    base = results["bare.pyth"]
    for name, preds in results.items():
        np.testing.assert_array_equal(preds, base, err_msg=name)


# ------------------------------------------------------------ TimeSformer


def test_timesformer_pyth_model_state(tmp_path):
    """HF-named TimeSformer weights in the reference's own
    ``{'model_state': sd}`` .pyth layout, at the driver's fixed ViT-B
    geometry (embed 768 / depth 12)."""
    from transformers import TimesformerConfig as HFConfig
    from transformers import TimesformerForVideoClassification

    torch.manual_seed(0)
    hf = TimesformerForVideoClassification(
        HFConfig(
            image_size=32, patch_size=16, num_frames=4, hidden_size=768,
            num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, num_labels=5,
            attention_type="divided_space_time", attn_implementation="eager",
        )
    ).eval()
    torch.nn.init.normal_(hf.timesformer.embeddings.cls_token, std=0.5)
    torch.nn.init.normal_(hf.timesformer.embeddings.position_embeddings, std=0.5)
    torch.nn.init.normal_(hf.timesformer.embeddings.time_embeddings, std=0.5)
    path = tmp_path / "timesformer.pyth"
    torch.save({"model_state": hf.state_dict(), "epoch": 15}, path)

    cfg = _base_cfg(
        tmp_path,
        [
            "MODEL.MODEL_NAME", "TimeSformer",
            "TIMESFORMER.ATTENTION_TYPE", "divided_space_time",
            "TEST.CHECKPOINT_FILE_PATH", str(path),
        ],
    )
    got, got_labels = _run_driver(cfg, tmp_path)
    exp, exp_labels = _expected_from_torch(cfg, _hf_forward(hf))
    _check(got, exp, got_labels, exp_labels, tol=2e-3)


# ------------------------------------------------------------ Motionformer


def _flax_to_reference_sd(params):
    """Invert the converter naming (vtm/checkpoints/convert.py::
    convert_motionformer): flax param tree -> reference-named torch
    state dict (motionformer_video_model_builder.py:25-283)."""
    sd = {}

    def dense(prefix, p):
        _inv_dense(sd, prefix, p)

    def layernorm(prefix, p):
        _inv_layernorm(sd, prefix, p)

    sd["cls_token"] = torch.from_numpy(np.asarray(params["cls_token"]).copy())
    sd["pos_embed"] = torch.from_numpy(np.asarray(params["pos_embed"]).copy())
    if "temp_embed" in params:
        sd["temp_embed"] = torch.from_numpy(np.asarray(params["temp_embed"]).copy())
    pe = params["patch_embed_3d"]
    sd["patch_embed_3d.proj.weight"] = torch.from_numpy(
        np.transpose(np.asarray(pe["kernel"]), (4, 3, 0, 1, 2)).copy()
    )
    sd["patch_embed_3d.proj.bias"] = torch.from_numpy(np.asarray(pe["bias"]).copy())
    i = 0
    while f"blocks_{i}" in params:
        blk = params[f"blocks_{i}"]
        layernorm(f"blocks.{i}.norm1", blk["norm1"])
        layernorm(f"blocks.{i}.norm2", blk["norm2"])
        dense(f"blocks.{i}.attn.qkv", blk["attn"]["qkv"])
        dense(f"blocks.{i}.attn.proj", blk["attn"]["proj"])
        if "proj_q" in blk["attn"]:
            dense(f"blocks.{i}.attn.proj_q", blk["attn"]["proj_q"])
            dense(f"blocks.{i}.attn.proj_kv", blk["attn"]["proj_kv"])
        dense(f"blocks.{i}.mlp.fc1", blk["mlp"]["fc1"])
        dense(f"blocks.{i}.mlp.fc2", blk["mlp"]["fc2"])
        i += 1
    layernorm("norm", params["norm"])
    dense("head", params["head"])
    return sd


def test_motionformer_pyth_ddp_model_state(tmp_path):
    """Reference-named Motionformer weights in a DDP-saved .pyth
    ({'model_state': {'module.*': ...}}) through the driver; expected
    side is the in-memory converted params applied module-level with
    the same sum-over-views ensembling (module-vs-torch-oracle parity
    is tests/test_motionformer.py)."""
    import jax

    from vtm.checkpoints.convert import convert_motionformer
    from vtm.models import build_model

    cfg = _base_cfg(
        tmp_path,
        [
            "MODEL.MODEL_NAME", "Motionformer",
            "MOTIONFORMER.EMBED_DIM", "32",
            "MOTIONFORMER.DEPTH", "2",
            "MOTIONFORMER.NUM_HEADS", "2",
            "MOTIONFORMER.MLP_RATIO", "2",
            "MOTIONFORMER.TEMPORAL_RESOLUTION", "2",
            "TEST.CHECKPOINT_FILE_PATH", str(tmp_path / "motionformer.pyth"),
        ],
    )
    bundle = build_model(cfg, rng=jax.random.key(7))
    src_params = bundle.params
    sd = _flax_to_reference_sd(src_params)
    torch.save(
        {"model_state": {f"module.{k}": v for k, v in sd.items()}, "epoch": 1},
        tmp_path / "motionformer.pyth",
    )

    got, got_labels = _run_driver(cfg, tmp_path)

    converted = convert_motionformer(sd, depth=2)
    module = bundle.module

    def forward(frames):
        out, _ = module.apply({"params": converted}, jnp.asarray(frames))
        return np.asarray(out)

    exp, exp_labels = _expected_from_torch(cfg, forward)
    # the file roundtrip must ALSO reproduce the source params exactly
    flat_src = {
        "/".join(map(str, p)): np.asarray(v)
        for p, v in _flatten(src_params)
    }
    flat_conv = {
        "/".join(map(str, p)): np.asarray(v)
        for p, v in _flatten(converted)
    }
    assert set(flat_conv) == set(flat_src)
    for k in flat_src:
        np.testing.assert_allclose(flat_conv[k], flat_src[k], rtol=0, atol=0,
                                   err_msg=k)
    _check(got, exp, got_labels, exp_labels, tol=1e-4)


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree


# ------------------------------------------------------- EPIC dual head


def _vivit_flax_to_reference_sd(params):
    """Invert convert_vivit's naming: flax ViViT params -> the
    reference EPIC wrapper state dict (vivit.* encoder + verb_classifier
    / noun_classifier heads, vivit_video_model_builder.py:22-28)."""
    sd = {}

    def dense(prefix, p):
        _inv_dense(sd, prefix, p)

    def layernorm(prefix, p):
        _inv_layernorm(sd, prefix, p)

    pe = params["patch_embed"]
    sd["vivit.embeddings.patch_embeddings.projection.weight"] = torch.from_numpy(
        np.transpose(np.asarray(pe["kernel"]), (4, 3, 0, 1, 2)).copy()
    )
    sd["vivit.embeddings.patch_embeddings.projection.bias"] = torch.from_numpy(
        np.asarray(pe["bias"]).copy()
    )
    sd["vivit.embeddings.cls_token"] = torch.from_numpy(
        np.asarray(params["cls_token"]).copy()
    )
    sd["vivit.embeddings.position_embeddings"] = torch.from_numpy(
        np.asarray(params["position_embeddings"]).copy()
    )
    layernorm("vivit.layernorm", params["layernorm"])
    i = 0
    while f"layer_{i}" in params:
        lyr = params[f"layer_{i}"]
        pre = f"vivit.encoder.layer.{i}"
        layernorm(f"{pre}.layernorm_before", lyr["layernorm_before"])
        layernorm(f"{pre}.layernorm_after", lyr["layernorm_after"])
        for nm in ("query", "key", "value"):
            dense(f"{pre}.attention.attention.{nm}", lyr["attention"][nm])
        dense(f"{pre}.attention.output.dense", lyr["attention_output"])
        dense(f"{pre}.intermediate.dense", lyr["intermediate"])
        dense(f"{pre}.output.dense", lyr["output"])
        i += 1
    for name in ("classifier", "verb_classifier", "noun_classifier"):
        if name in params:
            dense(name, params[name])
    return sd


def test_vivit_epic_dualhead_pyth(tmp_path):
    """EPIC-Kitchens dual-head ViViT from a .pyth file: reference
    wrapper naming (verb_classifier/noun_classifier heads) through the
    driver's EPIC branch (tools/test_net.py EPICTestMeter ensembling),
    compared against module-level apply + host-side sum-ensembling."""
    import json as _json

    import jax

    from vtm.checkpoints.convert import convert_vivit
    from vtm.data import construct_loader
    from vtm.models import build_model

    conf = {
        "video_size": [4, 32, 32],
        "tubelet_size": [2, 16, 16],
        "num_channels": 3,
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 2,
        "intermediate_size": 64,
        "hidden_act": "gelu_fast",
        "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0,
        "initializer_range": 0.02,
        "layer_norm_eps": 1e-6,
        "qkv_bias": True,
    }
    p = tmp_path / "vivit.json"
    p.write_text(_json.dumps(conf))
    cfg = _base_cfg(
        tmp_path,
        [
            "MODEL.MODEL_NAME", "ViViT",
            "VIVIT.CONFIG_PATH", str(p),
            "EPICKITCHENS.NUM_CLASSES", "[4, 6]",
            "TEST.CHECKPOINT_FILE_PATH", str(tmp_path / "vivit_epic.pyth"),
        ],
    )
    bundle = build_model(cfg, rng=jax.random.key(3))
    sd = _vivit_flax_to_reference_sd(bundle.params)
    assert "verb_classifier.weight" in sd and "noun_classifier.weight" in sd
    torch.save({"model_state": sd}, tmp_path / "vivit_epic.pyth")

    from tools.test_net import test as run_test

    run_test(cfg)
    with open(tmp_path / "preds.pkl", "rb") as f:
        got = pickle.load(f)

    converted = convert_vivit(sd, depth=2)
    loader = construct_loader(cfg, "test")
    num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    num_videos = len(loader.dataset) // num_clips
    exp_verb = np.zeros((num_videos, 4), np.float64)
    exp_noun = np.zeros((num_videos, 6), np.float64)
    for batch in loader:
        (verb, noun), _ = bundle.module.apply(
            {"params": converted},
            jnp.asarray(np.asarray(batch["frames"], np.float32)),
        )
        for j, idx in enumerate(np.asarray(batch["index"])):
            vid = int(idx) // num_clips
            exp_verb[vid] += np.asarray(verb)[j]
            exp_noun[vid] += np.asarray(noun)[j]
    np.testing.assert_array_equal(
        np.argmax(got["verb"], 1), np.argmax(exp_verb, 1)
    )
    np.testing.assert_array_equal(
        np.argmax(got["noun"], 1), np.argmax(exp_noun, 1)
    )
    np.testing.assert_allclose(got["verb"], exp_verb, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["noun"], exp_noun, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------ MViT


def test_mvit_pyth_model_state(tmp_path):
    """Legacy-family file e2e: the REFERENCE torch MViT's state dict
    saved as the reference's own {'model_state': sd} .pyth, driven
    through tools/test_net.py, against the torch model's forward on the
    same loader clips (reference video_model_builder.py:809-1267)."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_convnet import _install_native_stubs
    from test_mvit import _mvit_cfg
    from tests.conftest import load_reference_module

    _install_native_stubs()
    ref_builder = load_reference_module(
        "slowfast/models/video_model_builder.py", "ref_video_model_builder"
    )

    cfg = _mvit_cfg()
    cfg.merge_from_list(
        [
            "TEST.DATASET", "synthetic",
            "TEST.BATCH_SIZE", "4",
            "TEST.NUM_ENSEMBLE_VIEWS", "2",
            "TEST.NUM_SPATIAL_CROPS", "1",
            "DATA_LOADER.NUM_WORKERS", "0",
            "TEST.SAVE_RESULTS_PATH", str(tmp_path / "preds.pkl"),
            "TEST.CHECKPOINT_FILE_PATH", str(tmp_path / "mvit.pyth"),
            "OUTPUT_DIR", str(tmp_path),
        ]
    )
    from vtm.config import assert_and_infer_cfg

    cfg = assert_and_infer_cfg(cfg)

    torch.manual_seed(0)
    ref = ref_builder.MViT(cfg).eval()
    torch.save({"model_state": ref.state_dict(), "epoch": 30},
               tmp_path / "mvit.pyth")

    got, got_labels = _run_driver(cfg, tmp_path)

    def forward(frames):
        with torch.no_grad():
            x = torch.from_numpy(frames).permute(0, 4, 1, 2, 3)  # B,C,T,H,W
            return ref([x]).numpy()

    exp, exp_labels = _expected_from_torch(cfg, forward)
    _check(got, exp, got_labels, exp_labels, tol=1e-3)


def test_mvit_pyth_finetune_head_clear(tmp_path):
    """The pretrain->finetune handoff at the file level: a reference
    torch MViT trunk saved as .pyth, loaded into tools/train_net.py via
    TRAIN.CHECKPOINT_FILE_PATH with CHECKPOINT_CLEAR_NAME_PATTERN
    dropping the head (reference checkpoint.py:326-339) — after one
    zero-LR epoch the saved checkpoint's trunk must equal the file's
    weights bit-for-bit while the head kept its fresh init."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_convnet import _install_native_stubs
    from test_mvit import _mvit_cfg
    from tests.conftest import load_reference_module

    import jax

    from vtm.checkpoints import checkpoint as cu
    from vtm.checkpoints.convert import convert_mvit
    from vtm.models import build_model

    _install_native_stubs()
    ref_builder = load_reference_module(
        "slowfast/models/video_model_builder.py", "ref_video_model_builder"
    )

    cfg = _mvit_cfg()
    cfg.merge_from_list(
        [
            "TRAIN.ENABLE", "True",
            "TRAIN.DATASET", "synthetic",
            "TRAIN.BATCH_SIZE", "4",
            "TRAIN.EVAL_PERIOD", "10",
            "TRAIN.CHECKPOINT_PERIOD", "1",
            "TRAIN.AUTO_RESUME", "False",
            "TRAIN.CHECKPOINT_FILE_PATH", str(tmp_path / "trunk.pyth"),
            "TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN", "['head.']",
            "TEST.DATASET", "synthetic",
            "TEST.BATCH_SIZE", "4",
            "SOLVER.MAX_EPOCH", "1",
            # effectively zero LR (fp32 params don't move a single ulp)
            # without tripping the cosine policy's END_LR < BASE_LR
            # assert, so the trunk must come out of training bit-equal
            "SOLVER.BASE_LR", "1e-30",
            "SOLVER.WEIGHT_DECAY", "0.0",
            "SOLVER.WARMUP_EPOCHS", "0.0",
            "SOLVER.OPTIMIZING_METHOD", "sgd",
            "MODEL.DROPOUT_RATE", "0.0",
            "MVIT.DROPPATH_RATE", "0.0",
            "DATA_LOADER.NUM_WORKERS", "0",
            "OUTPUT_DIR", str(tmp_path),
        ]
    )
    cfg = assert_and_infer_cfg(cfg)

    torch.manual_seed(0)
    ref = ref_builder.MViT(cfg).eval()
    torch.save({"model_state": ref.state_dict()}, tmp_path / "trunk.pyth")

    from tools.train_net import train as run_train

    run_train(cfg)

    last = cu.get_last_checkpoint(str(tmp_path))
    assert last is not None
    bundle = build_model(cfg, rng=jax.random.key(0))
    trained, _, _, _ = cu.load_checkpoint(last, bundle.params)
    want = convert_mvit(ref.state_dict(), depth=cfg.MVIT.DEPTH)
    flat_want = dict(_flatten(want))
    flat_got = dict(_flatten(trained))
    head_keys = [p for p in flat_got if p[0] == "head"]
    assert head_keys, "MViT head missing from the train state"
    for path, v in flat_want.items():
        got_v = np.asarray(flat_got[path])
        if path == ("head", "kernel"):
            # cleared by the name pattern: fresh init, NOT the file's
            # (bias is a 0.02 constant in both inits — uninformative)
            assert not np.allclose(got_v, np.asarray(v)), path
        elif path[0] != "head":
            np.testing.assert_array_equal(got_v, np.asarray(v), err_msg=str(path))


# -------------------------------------------------------- SlowFast (BN)


def test_slowfast_pyth_model_state(tmp_path):
    """Conv-family file e2e: the REFERENCE torch SlowFast's state dict
    (BN running stats included) as a {'model_state': sd} .pyth through
    the driver — exercises convert_pyslowfast's params/batch_stats
    split at the file level — vs the torch model's eval forward."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_convnet import _install_native_stubs, tiny_cfg
    from tests.conftest import load_reference_module

    _install_native_stubs()
    ref_builder = load_reference_module(
        "slowfast/models/video_model_builder.py", "ref_video_model_builder"
    )

    cfg = tiny_cfg("SlowFast", "slowfast")
    cfg.merge_from_list(
        [
            "TEST.DATASET", "synthetic",
            "TEST.BATCH_SIZE", "4",
            "TEST.NUM_ENSEMBLE_VIEWS", "2",
            "TEST.NUM_SPATIAL_CROPS", "1",
            "TPU.COMPUTE_DTYPE", "float32",
            "DATA_LOADER.NUM_WORKERS", "0",
            "TEST.SAVE_RESULTS_PATH", str(tmp_path / "preds.pkl"),
            "TEST.CHECKPOINT_FILE_PATH", str(tmp_path / "slowfast.pyth"),
            "OUTPUT_DIR", str(tmp_path),
        ]
    )
    cfg = assert_and_infer_cfg(cfg)

    torch.manual_seed(0)
    ref = ref_builder.SlowFast(cfg).eval()
    # make the BN running stats non-trivial so the file path is proven
    # to carry them (fresh init is all mean-0/var-1)
    with torch.no_grad():
        for m in ref.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    torch.save({"model_state": ref.state_dict(), "epoch": 196},
               tmp_path / "slowfast.pyth")

    got, got_labels = _run_driver(cfg, tmp_path)

    alpha = cfg.SLOWFAST.ALPHA

    def forward(frames):
        with torch.no_grad():
            fast = torch.from_numpy(frames).permute(0, 4, 1, 2, 3)
            t = fast.shape[2]
            idx = torch.linspace(0, t - 1, t // alpha).long()
            slow = torch.index_select(fast, 2, idx)
            return ref([slow, fast]).numpy()

    exp, exp_labels = _expected_from_torch(cfg, forward)
    _check(got, exp, got_labels, exp_labels, tol=1e-3)
