"""AVA evaluation parity vs the vendored TF object-detection evaluator
(/root/reference/ava_evaluation — pure numpy, imported as oracle)."""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_eval():
    if REFERENCE not in sys.path:
        # append (not prepend): the reference also has a tools/ package
        # which must not shadow the repo's
        sys.path.append(REFERENCE)
    ode = pytest.importorskip("ava_evaluation.object_detection_evaluation")
    from ava_evaluation import standard_fields

    return ode, standard_fields


def _random_scene(rng, num_images=6, num_classes=5, max_gt=4, max_det=8):
    """Random boxes/labels/scores per image, with some detections copied
    from ground truth (near-hits) and some random (misses)."""
    gts, dets = {}, {}
    for i in range(num_images):
        key = f"vid,{i:04d}"
        n_gt = rng.integers(1, max_gt + 1)
        y1x1 = rng.random((n_gt, 2)) * 0.5
        hw = rng.random((n_gt, 2)) * 0.4 + 0.1
        g_boxes = np.concatenate([y1x1, y1x1 + hw], axis=1)
        g_classes = rng.integers(1, num_classes + 1, n_gt)
        gts[key] = (g_boxes, g_classes)

        n_det = rng.integers(1, max_det + 1)
        d_boxes, d_classes = [], []
        for _ in range(n_det):
            if rng.random() < 0.6:
                j = rng.integers(0, n_gt)
                jitter = rng.normal(0, 0.02, 4)
                d_boxes.append(g_boxes[j] + jitter)
                d_classes.append(
                    g_classes[j] if rng.random() < 0.8
                    else rng.integers(1, num_classes + 1)
                )
            else:
                p = rng.random((2,)) * 0.5
                wh = rng.random((2,)) * 0.4 + 0.05
                d_boxes.append(np.concatenate([p, p + wh]))
                d_classes.append(rng.integers(1, num_classes + 1))
        dets[key] = (
            np.asarray(d_boxes),
            np.asarray(d_classes),
            rng.random(n_det),
        )
    return gts, dets


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pascal_evaluator_matches_vendored(ref_eval, seed):
    ode, standard_fields = ref_eval
    from vtm.eval.ava_eval import PascalDetectionEvaluator

    rng = np.random.default_rng(seed)
    num_classes = 5
    categories = [{"id": c + 1, "name": f"class{c + 1}"} for c in range(num_classes)]
    gts, dets = _random_scene(rng, num_classes=num_classes)

    theirs = ode.PascalDetectionEvaluator(categories)
    ours = PascalDetectionEvaluator(categories)
    for key, (boxes, classes) in gts.items():
        theirs.add_single_ground_truth_image_info(
            key,
            {
                standard_fields.InputDataFields.groundtruth_boxes: boxes.astype(float),
                standard_fields.InputDataFields.groundtruth_classes: classes.astype(int),
                standard_fields.InputDataFields.groundtruth_difficult: np.zeros(
                    len(classes), dtype=bool
                ),
            },
        )
        ours.add_single_ground_truth_image_info(key, boxes, classes)
    for key, (boxes, classes, scores) in dets.items():
        theirs.add_single_detected_image_info(
            key,
            {
                standard_fields.DetectionResultFields.detection_boxes: boxes.astype(float),
                standard_fields.DetectionResultFields.detection_classes: classes.astype(int),
                standard_fields.DetectionResultFields.detection_scores: scores.astype(float),
            },
        )
        ours.add_single_detected_image_info(key, boxes, classes, scores)

    want = theirs.evaluate()
    got = ours.evaluate()
    for k, v in want.items():
        assert k in got, k
        np.testing.assert_allclose(got[k], v, atol=1e-9, err_msg=k)


def test_evaluate_ava_end_to_end(tmp_path, ref_eval):
    """Array-level evaluate_ava (csv round trip + whitelist + exclusions)."""
    from vtm.eval import ava_eval

    rng = np.random.default_rng(3)
    num_classes = 4
    categories = [{"id": c + 1, "name": f"c{c + 1}"} for c in range(num_classes)]
    whitelist = {1, 2, 3, 4}
    n = 10
    preds = rng.random((n, num_classes))
    boxes = np.concatenate(
        [np.zeros((n, 1)), rng.random((n, 2)) * 0.4,
         0.5 + rng.random((n, 2)) * 0.4], axis=1
    )  # batch, x1, y1, x2, y2
    metadata = np.stack([np.zeros(n), np.arange(n) % 3], axis=1)
    gt_boxes = {f"v,{i:04d}": [[0.1, 0.1, 0.6, 0.6]] for i in range(3)}
    gt_labels = {k: [1] for k in gt_boxes}
    gt_scores = {k: [1.0] for k in gt_boxes}

    mAP = ava_eval.evaluate_ava(
        preds, boxes, metadata,
        excluded_keys=set(),
        class_whitelist=whitelist,
        categories=categories,
        groundtruth=(gt_boxes, gt_labels, gt_scores),
        video_idx_to_name=["v"],
        output_dir=str(tmp_path),
    )
    assert 0.0 <= mAP <= 1.0
    assert (tmp_path / "detections_latest.csv").exists()
    # written detections re-read into the same structures
    rb, rl, rs = ava_eval.read_csv(
        str(tmp_path / "detections_latest.csv"), whitelist, load_score=True
    )
    assert set(rb) == {f"v,{i:04d}" for i in range(3)}


def test_read_labelmap_and_exclusions(tmp_path):
    from vtm.eval.ava_eval import read_exclusions, read_labelmap

    pbtxt = tmp_path / "labels.pbtxt"
    pbtxt.write_text(
        'item {\n  name: "bend/bow (at the waist)"\n  id: 1\n}\n'
        'item {\n  name: "crouch/kneel"\n  id: 3\n}\n'
    )
    labelmap, ids = read_labelmap(str(pbtxt))
    assert ids == {1, 3}
    assert labelmap[0]["name"] == "bend/bow (at the waist)"

    exc = tmp_path / "exc.csv"
    exc.write_text("vid1,0902\nvid2,0903\n")
    assert read_exclusions(str(exc)) == {"vid1,0902", "vid2,0903"}

    # the shipped AVA v2.1 labelmap parses (80 classes)
    import pathlib

    ref_map = pathlib.Path(
        "/root/reference/ava_evaluation/"
        "ava_action_list_v2.1_for_activitynet_2018.pbtxt.txt"
    )
    if ref_map.exists():
        labelmap, ids = read_labelmap(str(ref_map))
        assert len(ids) == 60


# --------------------------------------------------------------- dataset


def _write_ava_tree(tmp_path, num_videos=2, secs=(902, 906), fps_frames=400):
    """Synthetic AVA layout: frame lists + jpgs + box csvs + labelmap +
    groundtruth + exclusions."""
    import cv2

    rng = np.random.default_rng(0)
    frame_dir = tmp_path / "frames"
    list_dir = tmp_path / "frame_lists"
    ann_dir = tmp_path / "annotations"
    for d in (frame_dir, list_dir, ann_dir):
        d.mkdir(exist_ok=True)
    lines = ["original_vido_id video_id frame_id path labels"]
    names = [f"vid{v}" for v in range(num_videos)]
    for v, name in enumerate(names):
        (frame_dir / name).mkdir(exist_ok=True)
        for f in range(fps_frames):
            rel = f"{name}/{name}_{f:06d}.jpg"
            img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            cv2.imwrite(str(frame_dir / rel), img)
            lines.append(f'{name} {v} {f} {rel} ""')
    for split in ("train.csv", "val.csv"):
        (list_dir / split).write_text("\n".join(lines) + "\n")

    # gt + predicted boxes (x1,y1,x2,y2 normalized), labels 1..3
    gt_rows, pred_rows = [], []
    for name in names:
        for sec in secs:
            gt_rows.append(f"{name},{sec},0.1,0.1,0.6,0.7,1,1")
            gt_rows.append(f"{name},{sec},0.4,0.3,0.9,0.9,2,2")
            pred_rows.append(f"{name},{sec},0.1,0.1,0.6,0.7,,0.95")
            pred_rows.append(f"{name},{sec},0.4,0.3,0.9,0.9,,0.99")
    (ann_dir / "ava_train_v2.2.csv").write_text("\n".join(gt_rows) + "\n")
    (ann_dir / "ava_val_predicted_boxes.csv").write_text("\n".join(pred_rows) + "\n")
    (ann_dir / "ava_val_v2.2.csv").write_text("\n".join(gt_rows) + "\n")
    (ann_dir / "labels.pbtxt").write_text(
        "".join(
            f'item {{\n  name: "act{i}"\n  id: {i}\n}}\n' for i in (1, 2, 3)
        )
    )
    (ann_dir / "exclusions.csv").write_text("")
    return frame_dir, list_dir, ann_dir


def _ava_cfg(tmp_path):
    from test_convnet import tiny_cfg

    frame_dir, list_dir, ann_dir = _write_ava_tree(tmp_path)
    cfg = tiny_cfg("SlowFast", "slowfast")
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.DETECTION.ENABLE = True
    cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
    cfg.DETECTION.ROI_XFORM_RESOLUTION = 2
    cfg.AVA.FRAME_DIR = str(frame_dir)
    cfg.AVA.FRAME_LIST_DIR = str(list_dir)
    cfg.AVA.ANNOTATION_DIR = str(ann_dir)
    cfg.AVA.LABEL_MAP_FILE = "labels.pbtxt"
    cfg.AVA.GROUNDTRUTH_FILE = "ava_val_v2.2.csv"
    cfg.AVA.EXCLUSION_FILE = "exclusions.csv"
    cfg.AVA.FULL_TEST_ON_VAL = True
    cfg.TEST.DATASET = "ava"
    cfg.TRAIN.DATASET = "ava"
    cfg.TEST.BATCH_SIZE = 2
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [32, 40]
    return cfg


def test_ava_helper_parsing_matches_reference(tmp_path):
    from test_convnet import _install_native_stubs

    _install_native_stubs()
    from conftest import load_reference_module

    ref_helper = load_reference_module(
        "slowfast/datasets/ava_helper.py", "ref_ava_helper"
    )
    from vtm.data import ava as vava

    cfg = _ava_cfg(tmp_path)
    for is_train in (True, False):
        want_paths, want_names = ref_helper.load_image_lists(cfg, is_train)
        got_paths, got_names = vava.load_image_lists(cfg, is_train)
        assert want_names == got_names
        assert want_paths == got_paths
    for mode in ("train", "val", "test"):
        want = ref_helper.load_boxes_and_labels(cfg, mode)
        got = vava.load_boxes_and_labels(cfg, mode)
        assert want == got, mode
    want_boxes = ref_helper.load_boxes_and_labels(cfg, "train")
    want_boxes = [want_boxes[n] for n in ("vid0", "vid1")]
    wk, wb = ref_helper.get_keyframe_data(want_boxes)
    gk, gb = vava.get_keyframe_data(want_boxes)
    assert wk == gk and wb == gb
    assert ref_helper.get_num_boxes_used(wk, wb) == sum(
        len(b) for video in gb for b in video
    )


def test_ava_dataset_items(tmp_path):
    from vtm.data.ava import Ava

    cfg = _ava_cfg(tmp_path)
    for split in ("train", "val", "test"):
        ds = Ava(cfg, split)
        assert len(ds) == 4  # 2 videos x 2 annotated secs
        item = ds[0]
        t = cfg.DATA.NUM_FRAMES
        assert item["frames"].shape[0] == t
        assert item["frames"].shape[3] == 3
        assert item["boxes"].shape[1] == 4
        assert item["label"].shape == (len(item["boxes"]), 3)
        assert item["metadata"].shape == (len(item["boxes"]), 2)
        if split == "train":
            assert item["frames"].shape[1] == cfg.DATA.TRAIN_CROP_SIZE


def test_ava_detection_test_e2e(tmp_path):
    """Full detection eval: SlowFast + ROI head -> AVAMeter -> mAP."""
    from tools.test_net import test
    from vtm.config import assert_and_infer_cfg

    cfg = _ava_cfg(tmp_path)
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TRAIN.ENABLE = False
    cfg.NUM_GPUS = 1
    cfg.LOG_MODEL_INFO = False
    assert_and_infer_cfg(cfg)
    results = test(cfg)
    stats = results[0][1]
    assert "map" in stats and 0.0 <= stats["map"] <= 1.0
    assert (tmp_path / "detections_latest.csv").exists()


def test_roi_align_basic():
    """ROI covering exactly one feature cell reproduces that cell; a
    full-image ROI of a constant map is constant."""
    import jax.numpy as jnp

    from vtm.models.roi_head import roi_align

    feat = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    # box in input px with scale 1/1: cover cell (y=1..2, x=2..3)
    boxes = jnp.asarray([[0.0, 2.0, 1.0, 3.0, 2.0]])
    out = roi_align(feat, boxes, resolution=1, spatial_scale=1.0, aligned=True)
    # bilinear at the cell centre (y=1.5->1.0 after offset, x=2.5->2.0)
    assert abs(float(out[0, 0, 0, 0]) - feat[0, 1, 2, 0]) < 0.75

    const = jnp.full((2, 8, 8, 3), 5.0)
    boxes = jnp.asarray([[1.0, 0.0, 0.0, 8.0, 8.0]])
    out = roi_align(const, boxes, resolution=3, spatial_scale=1.0)
    np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-6)


def test_ava_train_e2e(tmp_path):
    """One AVA detection training epoch (bce on per-box labels through
    the ROI head) + a detection val eval."""
    from tools.train_net import train
    from vtm.config import assert_and_infer_cfg

    cfg = _ava_cfg(tmp_path)
    cfg.merge_from_list([
        "MODEL.LOSS_FUNC", "bce_logit",
        "TRAIN.ENABLE", "True",
        "TRAIN.BATCH_SIZE", "2",
        "SOLVER.MAX_EPOCH", "1",
        "SOLVER.OPTIMIZING_METHOD", "sgd",
        "TRAIN.EVAL_PERIOD", "1",
        "TRAIN.CHECKPOINT_PERIOD", "10",
        "DATA_LOADER.NUM_WORKERS", "0",
        "NUM_GPUS", "1",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    params = train(cfg)
    assert params is not None


def test_ava_detection_mvit_e2e(tmp_path):
    """MViT + ROI head detection eval (video_model_builder.py:1057-1066:
    norm -> strip cls -> refold [T,H,W] grid -> ResNetRoIHead)."""
    from tools.test_net import test
    from vtm.config import assert_and_infer_cfg

    cfg = _ava_cfg(tmp_path)
    cfg.merge_from_list([
        "MODEL.MODEL_NAME", "MViT",
        "MODEL.ARCH", "mvit",
        "DATA.INPUT_CHANNEL_NUM", "[3]",
        "MVIT.EMBED_DIM", "16",
        "MVIT.NUM_HEADS", "2",
        "MVIT.DEPTH", "2",
        "MVIT.PATCH_KERNEL", "[3, 7, 7]",
        "MVIT.PATCH_STRIDE", "[2, 4, 4]",
        "MVIT.PATCH_PADDING", "[1, 3, 3]",
        "MVIT.POOL_Q_STRIDE", "[[1, 1, 2, 2]]",
        "MVIT.POOL_KVQ_KERNEL", "[3, 3, 3]",
        "DETECTION.SPATIAL_SCALE_FACTOR", "8",
        "OUTPUT_DIR", str(tmp_path),
        "TRAIN.ENABLE", "False",
        "NUM_GPUS", "1",
        "LOG_MODEL_INFO", "False",
    ])
    assert_and_infer_cfg(cfg)
    results = test(cfg)
    stats = results[0][1]
    assert "map" in stats and 0.0 <= stats["map"] <= 1.0
