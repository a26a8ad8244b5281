"""End-to-end driver tests on the synthetic dataset (tiny models)."""

import json

import numpy as np
import pytest

from vtm.config import assert_and_infer_cfg, get_cfg


def _tiny_vivit_cfg(tmp_path):
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
            "TEST.NUM_SPATIAL_CROPS", "1",
            "TOME.ENABLE", "True",
            "TOME.R_VALUE", "1",
            "TPU.COMPUTE_DTYPE", "float32",
            "DATA_LOADER.NUM_WORKERS", "2",
            "OUTPUT_DIR", str(tmp_path),
        ]
    )
    return assert_and_infer_cfg(cfg)


def test_test_net_end_to_end(tmp_path):
    from tools.test_net import test as run_test

    cfg = _tiny_vivit_cfg(tmp_path)
    results = run_test(cfg)
    assert len(results) == 1
    num_view, stats = results[0]
    assert num_view == 2
    assert "top1_acc" in stats
    assert 0.0 <= float(stats["top1_acc"]) <= 100.0


def test_test_net_tensor_parallel(tmp_path):
    """test_net with TPU.MODEL_PARALLEL=2: the (data, model) mesh path
    must produce the same metrics as the dp-only run."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    from tools.test_net import test as run_test

    cfg = _tiny_vivit_cfg(tmp_path)
    dp_stats = run_test(cfg)[0][1]
    cfg.TPU.MODEL_PARALLEL = 2
    tp_stats = run_test(cfg)[0][1]
    assert tp_stats["top1_acc"] == dp_stats["top1_acc"]
    assert tp_stats["top5_acc"] == dp_stats["top5_acc"]


def test_model_benchmark_end_to_end(tmp_path):
    from tools.model_benchmark import model_benchmark

    cfg = _tiny_vivit_cfg(tmp_path)
    cfg.MODEL_BENCHMARK.WARMUP_ITERATIONS = 1
    cfg.MODEL_BENCHMARK.ITERATIONS = 3
    stats = model_benchmark(cfg)
    assert stats["fps"] > 0
    assert stats["clips_per_sec"] > 0


def test_model_benchmark_profiler_trace(tmp_path):
    """MODEL_BENCHMARK.TRACE_DIR captures a jax.profiler trace of one
    forward (the TPU analog of the reference's CUDA-event timing)."""
    from tools.model_benchmark import model_benchmark

    cfg = _tiny_vivit_cfg(tmp_path)
    cfg.MODEL_BENCHMARK.ITERATIONS = 1
    trace_dir = tmp_path / "trace"
    cfg.MODEL_BENCHMARK.TRACE_DIR = str(trace_dir)
    stats = model_benchmark(cfg)
    assert stats.get("trace_dir") == str(trace_dir)
    assert any(f.is_file() for f in trace_dir.rglob("*"))


def test_data_benchmark_end_to_end(tmp_path):
    from tools.benchmark import benchmark_data_loading

    cfg = _tiny_vivit_cfg(tmp_path)
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.BENCHMARK.NUM_EPOCHS = 1
    stats = benchmark_data_loading(cfg)
    assert stats["batches_per_sec"] > 0


def test_padded_eval_rows_never_reach_meter():
    """pad_to_multiple duplicates row 0 to fill the mesh batch; the
    meter must see exactly the n_valid real rows (a duplicated row would
    double-count video 0's clip and corrupt its ensemble)."""
    import sys

    from vtm.eval.meters import TestMeter

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    from test_net import perform_test

    cfg = get_cfg()
    cfg.TEST.DATASET = "synthetic"
    num_videos, num_cls, batch_size = 3, 4, 4  # 3 rows -> padded to 4

    rng = np.random.default_rng(0)
    frames = rng.standard_normal((num_videos, 2, 8, 8, 3)).astype(np.float32)
    labels = np.array([0, 1, 2])
    loader = [{"frames": frames, "label": labels, "index": np.arange(num_videos)}]

    def eval_step(params, x):
        # content-dependent logits: padded duplicate rows produce real
        # numbers, so any leak into the meter shifts video 0's ensemble
        x = np.asarray(x)
        return x.reshape(x.shape[0], -1)[:, :num_cls].astype(np.float32)

    meter = TestMeter(num_videos, 1, num_cls, 1, "sum")
    perform_test(loader, eval_step, None, meter, cfg, batch_size)
    expected = frames.reshape(num_videos, -1)[:, :num_cls]
    np.testing.assert_allclose(meter.video_preds, expected, rtol=1e-6)
    np.testing.assert_array_equal(meter.clip_count, np.ones(num_videos))


def test_merge_into_template_classifier_drop():
    """Backbone tensors load; mismatched classifier keeps random init
    (reference classifier resize/drop, timesformer_helpers.py:150-167)."""
    from vtm.checkpoints.checkpoint import merge_into_template

    template = {
        "blocks_0": {"kernel": np.zeros((4, 4), np.float32)},
        "head": {"kernel": np.zeros((4, 5), np.float32), "bias": np.zeros(5, np.float32)},
    }
    converted = {
        "blocks_0": {"kernel": np.ones((4, 4), np.float32)},
        "head": {"kernel": np.ones((4, 7), np.float32), "bias": np.ones(7, np.float32)},
    }
    merged, loaded, kept = merge_into_template(template, converted)
    assert loaded == 1 and kept == 2
    assert merged["blocks_0"]["kernel"].sum() == 16  # loaded
    assert merged["head"]["kernel"].sum() == 0  # kept init


@pytest.mark.parametrize("mode,extra", [
    ("drop", []),
    ("hybrid", ["TOME.THRESHOLD", "0.4"]),
    ("random_merge", []),
    ("merge", ["TOME.HEAD_AGGREGATION", "concat"]),
])
def test_test_net_tome_modes(tmp_path, mode, extra):
    from tools.test_net import test as run_test

    cfg = _tiny_vivit_cfg(tmp_path)
    cfg.merge_from_list(["TOME.MODE", mode] + extra)
    results = run_test(cfg)
    assert 0.0 <= float(results[0][1]["top1_acc"]) <= 100.0


def test_test_net_temporal_clip_sweep(tmp_path):
    """TEST.NUM_TEMPORAL_CLIPS sweep (reference run_net.py:29-35)."""
    from tools.test_net import test as run_test

    cfg = _tiny_vivit_cfg(tmp_path)
    cfg.TEST.NUM_TEMPORAL_CLIPS = [1, 2]
    results = run_test(cfg)
    assert [v for v, _ in results] == [1, 2]


def test_test_net_three_crop(tmp_path):
    from tools.test_net import test as run_test

    cfg = _tiny_vivit_cfg(tmp_path)
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    results = run_test(cfg)
    assert 0.0 <= float(results[0][1]["top1_acc"]) <= 100.0


def test_run_net_train_then_test_uses_trained_checkpoint(tmp_path):
    """After TRAIN.ENABLE, testing picks up the last training checkpoint
    (reference load_test_checkpoint fallback, checkpoint.py:678-749)."""
    from tools.test_net import test as run_test
    from tools.train_net import train

    cfg = _tiny_vivit_cfg(tmp_path)
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.TRAIN.EVAL_PERIOD = 10
    train(cfg)
    results = run_test(cfg)  # no TEST.CHECKPOINT_FILE_PATH set
    assert results
