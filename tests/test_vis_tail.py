"""Visualization long tail: activations capture, layer-index parsing
parity, async multiprocess drawing, AVA precomputed-box demo helpers,
and the MODEL_VIS.ACTIVATIONS / TOPK_PREDS driver path."""

import numpy as np
import pytest


def test_indexing_parses_match_reference():
    from test_convnet import _install_native_stubs

    _install_native_stubs()
    from conftest import load_reference_module

    ref = load_reference_module(
        "slowfast/visualization/utils.py", "ref_vis_utils"
    )
    from vtm.vis.activations import get_indexing, process_layer_index_data

    for s in ("1,2;1,2", "0;3,4;5", "7"):
        want = ref.get_indexing(s)
        got = get_indexing(s)
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), g)

    layer_ls = ["layer1 1,2;2", "layer2", "layer3 0;3,4"]
    want_names, want_idx = ref.process_layer_index_data(layer_ls, "pre/")
    got_names, got_idx = process_layer_index_data(layer_ls, "pre/")
    assert want_names == got_names
    assert set(want_idx) == set(got_idx)
    for k in want_names:
        assert len(want_idx[k]) == len(got_idx[k])


def test_get_activations_and_weights(tmp_path):
    from test_gradcam import _tiny_videomae_cfg
    from vtm.models.build import build_model
    from vtm.vis.activations import get_activations, get_weights

    cfg = _tiny_videomae_cfg(tmp_path, trace=False, r=0)
    bundle = build_model(cfg)
    frames = np.random.default_rng(0).standard_normal(
        (2, 4, 32, 32, 3)
    ).astype(np.float32)

    acts, preds = get_activations(bundle, frames, ["blocks_0/attn"])
    assert list(acts) == ["blocks_0/attn"]
    assert acts["blocks_0/attn"].shape[0] == 2
    assert preds.shape == (2, 5)

    # empty layer list captures every submodule
    acts_all, _ = get_activations(bundle, frames, [])
    assert any(k.startswith("blocks_") for k in acts_all)

    w = get_weights(bundle.params, ["head", "blocks_0/attn/qkv"])
    assert set(w) == {"head", "blocks_0/attn/qkv"}
    assert w["blocks_0/attn/qkv"].ndim == 2


def test_async_vis_roundtrip():
    """Multiprocess drawing workers: tasks come back id-ordered with
    annotated frames (reference AsyncVis get() contract)."""
    import time

    from vtm.vis.async_predictor import AsyncVis
    from vtm.vis.demo import TaskInfo
    from vtm.vis.video_visualizer import VideoVisualizer

    vis = VideoVisualizer(num_classes=5, top_k=2)
    async_vis = AsyncVis(vis, n_workers=2)
    try:
        for i in range(3):
            frames = [
                np.full((32, 48, 3), 30 * i, np.uint8) for _ in range(4)
            ]
            task = TaskInfo(i, frames)
            task.add_action_preds(np.linspace(0, 1, 5))
            task.clip_vis_size = 2
            async_vis.put(task)
        got = []
        deadline = time.time() + 30
        while len(got) < 3 and time.time() < deadline:
            try:
                got.append(async_vis.get())
            except IndexError:
                time.sleep(0.05)
        assert [t.id for t in got] == [0, 1, 2]
        assert got[0].frames.shape == (4, 32, 48, 3)
        # drawn frames differ from the original constant image
        assert got[1].frames.std() > 0
    finally:
        async_vis.shutdown()


def test_video_visualizer_labels_match_reference():
    from test_convnet import _install_native_stubs

    _install_native_stubs()
    from conftest import load_reference_module

    ref = load_reference_module(
        "slowfast/visualization/video_visualizer.py", "ref_video_vis"
    )
    from vtm.vis.video_visualizer import _create_text_labels

    names = [f"c{i}" for i in range(5)]
    want = ref._create_text_labels([1, 3], [0.25, 0.5], names)
    got = _create_text_labels([1, 3], [0.25, 0.5], names)
    assert want == got
    want = ref._create_text_labels([2], None, names, ground_truth=True)
    got = _create_text_labels([2], None, names, ground_truth=True)
    assert want == got


def test_ava_demo_box_loading_matches_reference(tmp_path):
    """load_boxes_labels / merge_pred_gt_boxes parity on a synthetic
    AVA csv (the reference fns are pure csv+numpy)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_convnet import _install_native_stubs

    _install_native_stubs()
    from conftest import REFERENCE, load_reference_module

    # the reference module does `from slowfast.models import build_model`;
    # when an earlier parity test already registered slowfast.models as a
    # synthetic path-only package (load_reference_module does this), that
    # from-import can't resolve — pre-register it with a stub (the fns
    # under test never build a model) so the test is order-independent.
    import types

    ref_models = sys.modules.get("slowfast.models")
    if ref_models is None:
        ref_models = types.ModuleType("slowfast.models")
        ref_models.__path__ = [str(REFERENCE / "slowfast/models")]
        sys.modules["slowfast.models"] = ref_models
    if not hasattr(ref_models, "build_model"):
        ref_models.build_model = lambda *a, **k: None

    csv = tmp_path / "boxes.csv"
    rows = [
        "vid,902,0.1,0.2,0.5,0.6,4,0.95",
        "vid,902,0.3,0.1,0.9,0.8,2,0.91",
        "vid,903,0.2,0.2,0.4,0.4,7,0.99",
    ]
    csv.write_text("\n".join(rows) + "\n")

    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.DEMO.PREDS_BOXES = str(csv)
    cfg.DEMO.GT_BOXES = ""
    cfg.DEMO.STARTING_SECOND = 900
    cfg.AVA.DETECTION_SCORE_THRESH = 0.9

    ref = load_reference_module(
        "slowfast/visualization/ava_demo_precomputed_boxes.py",
        "ref_ava_demo",
    )
    from tools.ava_demo_precomputed_boxes import (
        load_boxes_labels, merge_pred_gt_boxes,
    )

    want_pred, want_gt = ref.load_boxes_labels(cfg, "vid", 30, 320, 240)
    got_pred, got_gt = load_boxes_labels(cfg, "vid", 30, 320, 240)
    assert want_gt is None and got_gt is None
    assert set(want_pred) == set(got_pred)
    for k in want_pred:
        np.testing.assert_allclose(want_pred[k][0], got_pred[k][0])
        assert want_pred[k][1] == got_pred[k][1]

    want_m = ref.merge_pred_gt_boxes(want_pred, None)
    got_m = merge_pred_gt_boxes(got_pred, None)
    assert set(want_m) == set(got_m)
    for k in want_m:
        assert want_m[k][0][0] == got_m[k][0][0]  # is_gt flag


def test_visualization_driver_activations_topk(tmp_path):
    """MODEL_VIS.ACTIVATIONS + LAYER_LIST + TOPK_PREDS + full
    GRAD_CAM.LAYER_LIST are live config keys."""
    from test_gradcam import _tiny_videomae_cfg
    from tools.visualization import run_visualization

    cfg = _tiny_videomae_cfg(tmp_path, trace=True, r=1)
    cfg.TENSORBOARD.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.ACTIVATIONS = True
    cfg.TENSORBOARD.MODEL_VIS.LAYER_LIST = ["blocks_0/attn", "blocks_1/mlp"]
    cfg.TENSORBOARD.MODEL_VIS.TOPK_PREDS = 3
    cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.ENABLE = True
    cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.LAYER_LIST = [
        "blocks_0/mlp", "blocks_1/mlp",
    ]
    cfg.TENSORBOARD.MODEL_VIS.MAX_BATCHES = 1
    run_visualization(cfg)
    assert list(tmp_path.glob("runs-*/events.out.tfevents.*"))


def test_get_class_names_matches_reference(tmp_path):
    import json

    from test_convnet import _install_native_stubs

    _install_native_stubs()
    from conftest import load_reference_module

    ref_misc = load_reference_module("slowfast/utils/misc.py", "ref_misc")
    from vtm.utils.class_names import get_class_names

    classes = {"run": 0, "jump": 2, "walk": 1}
    (tmp_path / "classes.json").write_text(json.dumps(classes))
    (tmp_path / "parents.json").write_text(
        json.dumps({"move": ["run", "walk", "fly"], "leap": ["jump"]})
    )
    (tmp_path / "subset.txt").write_text("run\njump\nmissing\n")

    want = ref_misc.get_class_names(
        str(tmp_path / "classes.json"),
        str(tmp_path / "parents.json"),
        str(tmp_path / "subset.txt"),
    )
    got = get_class_names(
        str(tmp_path / "classes.json"),
        str(tmp_path / "parents.json"),
        str(tmp_path / "subset.txt"),
    )
    assert want == got
    assert got[0] == ["run", "walk", "jump"]
    assert got[1] == {"move": [0, 1], "leap": [2]}
    assert got[2] == [0, 2]
