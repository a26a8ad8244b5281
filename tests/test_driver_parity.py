"""Driver-level end-to-end parity vs the reference evaluation protocol
(VERDICT-r3 item 3): the full tools/test_net.py path — multi-view
enumeration, sharded forward, meter ensemble, finalize — must produce
the decisions the reference's TestMeter (slowfast/utils/meters.py:
259-441) produces from the same per-clip prediction stream.

The reference meters module is imported as a torch-CPU oracle with its
unavailable deps (fvcore/iopath/pytorchvideo/wandb/ava_evaluation)
stubbed — only the TestMeter/EPICTestMeter math runs.
"""

from __future__ import annotations

import importlib
import sys
import types
import unittest.mock as mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import load_reference_module  # noqa: E402

_DEEP_STUBS = (
    "fvcore", "fvcore.common", "fvcore.common.timer",
    "fvcore.common.registry", "fvcore.common.config",
    "fvcore.nn", "fvcore.nn.activation_count", "fvcore.nn.flop_count",
    "fvcore.nn.precise_bn", "wandb", "psutil",
    "pytorchvideo", "pytorchvideo.layers",
    "pytorchvideo.layers.distributed", "pytorchvideo.layers.batch_norm",
    "iopath", "iopath.common", "iopath.common.file_io", "simplejson",
    "matplotlib", "matplotlib.pyplot",
    "ava_evaluation", "ava_evaluation.object_detection_evaluation",
    "ava_evaluation.standard_fields",
)


@pytest.fixture(scope="module")
def ref_meters():
    for stub in _DEEP_STUBS:
        if stub in sys.modules:
            continue
        try:
            importlib.import_module(stub)  # real module wins
        except ImportError:
            m = mock.MagicMock(name=stub)
            m.__spec__ = importlib.machinery.ModuleSpec(stub, None)
            sys.modules[stub] = m
    ref = "/root/reference"
    for pkg, path in (
        ("slowfast", f"{ref}/slowfast"),
        ("slowfast.datasets", f"{ref}/slowfast/datasets"),
        ("slowfast.utils", f"{ref}/slowfast/utils"),
        ("slowfast.models", f"{ref}/slowfast/models"),
        ("slowfast.config", f"{ref}/slowfast/config"),
    ):
        # earlier tests' load_reference_module may have created the
        # package module WITHOUT __path__ (it loads leaf modules by file
        # path); submodule imports here then die with "unknown location"
        # — so ensure __path__ on pre-existing package modules too.
        m = sys.modules.get(pkg)
        if m is None:
            m = types.ModuleType(pkg)
            sys.modules[pkg] = m
        if not getattr(m, "__path__", None):
            m.__path__ = [path]
    for name in ("Kinetics", "Ssv2", "Epickitchens"):
        setattr(sys.modules["slowfast.datasets"], name, mock.MagicMock(name=name))
    # earlier tests (test_data_oracles) leave PARTIAL leaf stubs in
    # sys.modules (slowfast.datasets.build with only DATASET_REGISTRY,
    # slowfast.utils.logging with only get_logger); the meters import
    # chain needs more (build_dataset, log_json_stats). Evict any stub
    # that misses an attribute this chain uses so the REAL reference
    # module imports in its place (its own deps are stubbed above).
    for leaf, attr in (
        ("slowfast.datasets.build", "build_dataset"),
        ("slowfast.utils.logging", "log_json_stats"),
        ("slowfast.utils.env", "pathmgr"),
    ):
        stale = sys.modules.get(leaf)
        if stale is not None and not hasattr(stale, attr):
            del sys.modules[leaf]
    return load_reference_module("slowfast/utils/meters.py", "ref_meters_deep")


def _ref_cfg_stub():
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.TEST.CLIP_LENGTH_HISTOGRAM = False
    return cfg


@pytest.mark.parametrize("ensemble", ["sum", "max"])
def test_test_meter_protocol_parity(ref_meters, ensemble):
    """Identical per-clip prediction streams (shuffled batch order,
    multi-view) -> identical ensembled per-video predictions and
    identical finalized top-1/top-5 numbers."""
    from vtm.eval.meters import TestMeter

    videos, clips, ncls = 5, 6, 7
    rng = np.random.default_rng(0)
    preds = rng.random((videos * clips, ncls)).astype(np.float32)
    labels_v = rng.integers(0, ncls, videos)
    clip_ids = np.arange(videos * clips)
    labels = labels_v[clip_ids // clips]
    order = rng.permutation(videos * clips)

    ours = TestMeter(videos, clips, ncls, 1, ensemble, cfg=_ref_cfg_stub())
    ref = ref_meters.TestMeter(
        videos, _ref_cfg_stub(), clips, ncls, 1, ensemble_method=ensemble
    )
    for lo in range(0, videos * clips, 4):
        sel = order[lo : lo + 4]
        ours.update_stats(preds[sel], labels[sel], clip_ids[sel])
        ref.update_stats(
            torch.from_numpy(preds[sel]),
            torch.from_numpy(labels[sel]),
            torch.from_numpy(clip_ids[sel]),
        )
    got = ours.finalize_metrics()
    ref.finalize_metrics()
    np.testing.assert_allclose(
        ours.video_preds, ref.video_preds.numpy(), rtol=1e-5, atol=1e-6
    )
    assert got["top1_acc"] == ref.stats["top1_acc"]
    assert got["top5_acc"] == ref.stats["top5_acc"]


@pytest.mark.parametrize("ensemble", ["max"])
def test_test_meter_multi_label_parity(ref_meters, ensemble):
    """Multi-label (charades) protocol: identical multi-hot streams ->
    identical -1e10-floored ensembles and identical mAP (reference
    meters.py:295-300, 320-359, 412-419).

    Only "max" is bit-comparable: the reference's float32 "sum" path
    ABSORBS every prediction into the -1e10 floor (float32 eps at 1e10
    is ~1e3), degenerating the mAP to that of constant scores — a
    reference defect, deviated from deliberately (see
    test_test_meter_multi_label_sum_preserves_ranking)."""
    from vtm.eval.meters import TestMeter

    videos, clips, ncls = 5, 4, 9
    rng = np.random.default_rng(3)
    preds = rng.random((videos * clips, ncls)).astype(np.float32)
    labels_v = (rng.random((videos, ncls)) < 0.3).astype(np.float32)
    labels_v[:, -1] = 0.0  # a class with no positives (get_map drops it)
    clip_ids = np.arange(videos * clips)
    labels = labels_v[clip_ids // clips]
    order = rng.permutation(videos * clips)

    ours = TestMeter(
        videos, clips, ncls, 1, ensemble, cfg=_ref_cfg_stub(), multi_label=True
    )
    ref = ref_meters.TestMeter(
        videos, _ref_cfg_stub(), clips, ncls, 1,
        multi_label=True, ensemble_method=ensemble,
    )
    for lo in range(0, videos * clips, 4):
        sel = order[lo : lo + 4]
        ours.update_stats(preds[sel], labels[sel], clip_ids[sel])
        ref.update_stats(
            torch.from_numpy(preds[sel]),
            torch.from_numpy(labels[sel]),
            torch.from_numpy(clip_ids[sel]),
        )
    got = ours.finalize_metrics()
    ref.finalize_metrics()
    np.testing.assert_allclose(
        ours.video_preds, ref.video_preds.numpy(), rtol=1e-5, atol=1e-2
    )
    assert got["map"] == ref.stats["map"]
    assert got["top1_acc"] == ref.stats["top1_acc"]


def test_test_meter_multi_label_sum_preserves_ranking():
    """Deliberate deviation from the reference: our float64 "sum"
    ensemble keeps the clip predictions on top of the -1e10 floor (the
    floor is the same constant for every fully-counted video, so the
    mAP equals that of the plain summed predictions). The reference's
    float32 tensor absorbs them entirely."""
    from vtm.eval.meters import TestMeter, get_map

    videos, clips, ncls = 5, 4, 9
    rng = np.random.default_rng(4)
    preds = rng.random((videos * clips, ncls)).astype(np.float32)
    labels_v = (rng.random((videos, ncls)) < 0.3).astype(np.float32)
    labels_v[0, 0] = 1.0  # ensure at least one positive column
    clip_ids = np.arange(videos * clips)

    meter = TestMeter(
        videos, clips, ncls, 1, "sum", cfg=_ref_cfg_stub(), multi_label=True
    )
    meter.update_stats(preds, labels_v[clip_ids // clips], clip_ids)
    got = meter.finalize_metrics()
    plain = preds.astype(np.float64).reshape(videos, clips, ncls).sum(axis=1)
    expect = get_map(plain, labels_v.astype(np.float64))
    assert got["map"] == f"{expect * 100.0:.2f}"


def test_epic_meter_protocol_parity(ref_meters):
    """EPIC verb/noun twin-stream: identical triples -> identical
    finalized accuracies (reference EPICTestMeter:1344-1508)."""
    from vtm.eval.meters import EPICTestMeter

    videos, clips = 4, 3
    nverb, nnoun = 5, 6
    rng = np.random.default_rng(1)
    vp = rng.random((videos * clips, nverb)).astype(np.float32)
    np_ = rng.random((videos * clips, nnoun)).astype(np.float32)
    vl = rng.integers(0, nverb, videos)
    nl = rng.integers(0, nnoun, videos)
    ids = rng.permutation(videos * clips)

    ours = EPICTestMeter(videos, clips, (nverb, nnoun), 1)
    ref = ref_meters.EPICTestMeter(
        videos, _ref_cfg_stub(), clips, (nverb, nnoun), 1
    )
    for i in ids:
        vid = int(i) // clips
        meta = {"narration_id": [f"n{vid}"]}
        ours.update_stats(
            (vp[None, i], np_[None, i]),
            (np.array([vl[vid]]), np.array([nl[vid]])),
            meta["narration_id"],  # ours takes the per-item id list
            np.array([i]),
        )
        ref.update_stats(
            (torch.from_numpy(vp[None, i]), torch.from_numpy(np_[None, i])),
            (torch.tensor([vl[vid]]), torch.tensor([nl[vid]])),
            meta,
            torch.tensor([int(i)]),
        )
    got = ours.finalize_metrics()
    ref.finalize_metrics()
    np.testing.assert_allclose(ours.verb_preds, ref.verb_video_preds.numpy(), rtol=1e-5)
    np.testing.assert_allclose(ours.noun_preds, ref.noun_video_preds.numpy(), rtol=1e-5)
    for k in ("verb_top1_acc", "noun_top1_acc", "top1_acc"):
        if k in got and k in ref.stats:
            assert float(str(got[k])) == pytest.approx(
                float(str(ref.stats[k])), abs=1e-4
            ), k


def test_test_net_driver_matches_reference_meter(ref_meters, tmp_path, monkeypatch):
    """Full tools/test_net.py on the synthetic dataset with a recording
    meter: the per-clip (preds, labels, clip_ids) stream the DRIVER
    produces (crop enumeration order, padding drop, device gather) is
    replayed into the reference TestMeter — the driver's reported
    ensemble decisions must match the reference protocol exactly.
    Fails if any driver-level detail (view math, ensemble, finalize)
    diverges (reference tools/test_net.py:27-207 + meters.py:324-441)."""
    import json

    from vtm.config import assert_and_infer_cfg, get_cfg

    d = {
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
    p.write_text(json.dumps(d))
    cfg = get_cfg()
    cfg.merge_from_list(
        [
            "MODEL.MODEL_NAME", "ViViT",
            "VIVIT.CONFIG_PATH", str(p),
            "MODEL.NUM_CLASSES", "5",
            "DATA.NUM_FRAMES", "4",
            "DATA.TEST_CROP_SIZE", "32",
            "TEST.DATASET", "synthetic",
            "TEST.BATCH_SIZE", "4",
            "TEST.NUM_ENSEMBLE_VIEWS", "2",
            "TEST.NUM_SPATIAL_CROPS", "3",
            "TPU.COMPUTE_DTYPE", "float32",
            "DATA_LOADER.NUM_WORKERS", "0",
            "OUTPUT_DIR", str(tmp_path),
        ]
    )
    cfg = assert_and_infer_cfg(cfg)

    import tools.test_net as tn

    recorded = []
    real_meter_cls = tn.TestMeter

    class RecordingMeter(real_meter_cls):
        def update_stats(self, preds, labels, clip_ids):
            recorded.append(
                (np.array(preds), np.array(labels), np.array(clip_ids))
            )
            return super().update_stats(preds, labels, clip_ids)

    finalized = {}
    real_finalize = real_meter_cls.finalize_metrics

    def capture_finalize(self, ks=(1, 5)):
        stats = real_finalize(self, ks)
        finalized["video_preds"] = self.video_preds.copy()
        finalized["video_labels"] = np.array(self.video_labels)
        finalized["stats"] = stats
        finalized["num_clips"] = self.num_clips
        return stats

    monkeypatch.setattr(tn, "TestMeter", RecordingMeter)
    monkeypatch.setattr(RecordingMeter, "finalize_metrics", capture_finalize)
    tn.test(cfg)

    assert recorded, "driver produced no meter updates"
    videos = finalized["video_preds"].shape[0]
    clips = finalized["num_clips"]
    assert clips == 6  # 2 views x 3 crops

    # replay the exact driver stream into the reference meter
    ref = ref_meters.TestMeter(
        videos, _ref_cfg_stub(), clips, 5, 1,
        ensemble_method=cfg.DATA.ENSEMBLE_METHOD,
    )
    for preds, labels, ids in recorded:
        ref.update_stats(
            torch.from_numpy(np.asarray(preds, np.float32)),
            torch.from_numpy(np.asarray(labels)),
            torch.from_numpy(np.asarray(ids)),
        )
    ref.finalize_metrics()
    np.testing.assert_allclose(
        finalized["video_preds"], ref.video_preds.numpy(), rtol=1e-5, atol=1e-6
    )
    assert (
        finalized["video_preds"].argmax(-1) == ref.video_preds.numpy().argmax(-1)
    ).all()
    assert finalized["stats"]["top1_acc"] == ref.stats["top1_acc"]
