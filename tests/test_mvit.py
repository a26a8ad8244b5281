"""MViT parity vs the reference torch model (tiny configs).

Covers: MViTv1-style (joint abs pos, conv pooling attention, dim/head
muls) and MViTv2-style (sep pos embed / rel pos spatial+temporal,
residual pooling, dim_mul_in_att, adaptive kv stride)."""

import numpy as np
import pytest

from test_convnet import _install_native_stubs, ref_builder  # noqa: F401


def _mvit_cfg(**over):
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.PATCH_KERNEL = [3, 7, 7]
    cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.MVIT.DIM_MUL = [[1, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [3, 1, 2, 2]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    cfg.TPU.COMPUTE_DTYPE = "float32"  # parity vs the fp32 torch oracle
    for k, v in over.items():
        cfg.merge_from_list([k, repr(v) if isinstance(v, (list, tuple)) else str(v)])
    return cfg


def _run_mvit_parity(ref_builder, cfg, atol=3e-4):
    import torch
    import jax
    import jax.numpy as jnp

    from vtm.checkpoints.convert import convert_mvit
    from vtm.models.build import build_model

    torch.manual_seed(0)
    ref = ref_builder.MViT(cfg).eval()
    x = torch.randn(2, 3, cfg.DATA.NUM_FRAMES, 32, 32)
    with torch.no_grad():
        want = ref([x.clone()]).numpy()

    bundle = build_model(cfg, init=False)
    params = convert_mvit(ref.state_dict(), depth=cfg.MVIT.DEPTH)
    xs = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    init_params = bundle.module.init(jax.random.key(0), xs)["params"]
    conv_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    init_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]}
    assert conv_paths == init_paths, (
        f"missing={sorted(init_paths - conv_paths)[:8]} "
        f"extra={sorted(conv_paths - init_paths)[:8]}"
    )
    bundle.params = params
    got, _ = bundle.apply(xs)
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=1e-3)


def test_mvit_v1_style_parity(ref_builder):
    cfg = _mvit_cfg()
    _run_mvit_parity(ref_builder, cfg)


def test_mvit_v2_style_parity(ref_builder):
    cfg = _mvit_cfg()
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = True
    cfg.MVIT.RESIDUAL_POOLING = True
    cfg.MVIT.DIM_MUL_IN_ATT = True
    cfg.MVIT.USE_MEAN_POOLING = True
    _run_mvit_parity(ref_builder, cfg)


def test_mvit_sep_pos_separate_qkv_parity(ref_builder):
    cfg = _mvit_cfg()
    cfg.DATA.NUM_FRAMES = 8  # avg-pool kernel 3 needs T >= 3
    cfg.MVIT.SEP_POS_EMBED = True
    cfg.MVIT.SEPARATE_QKV = True
    cfg.MVIT.MODE = "avg"
    _run_mvit_parity(ref_builder, cfg)


def test_mvit_pool_first_no_cls_parity(ref_builder):
    cfg = _mvit_cfg()
    cfg.MVIT.POOL_FIRST = True
    cfg.MVIT.CLS_EMBED_ON = False
    # reference quirk: USE_FIXED_SINCOS_POS initializes pos_embed (which
    # requires USE_ABS_POS) and that pos_embed is added TWICE — once to
    # the patch tokens pre-cls-concat, once via the abs-pos add
    # (video_model_builder.py:1203-1232)
    cfg.MVIT.USE_FIXED_SINCOS_POS = True
    cfg.MVIT.USE_ABS_POS = True
    cfg.MVIT.USE_MEAN_POOLING = True
    _run_mvit_parity(ref_builder, cfg)


def test_mvit_test_net_e2e(tmp_path):
    """MViT through the full test driver on the synthetic dataset."""
    from tools.test_net import test
    from vtm.config import assert_and_infer_cfg

    cfg = _mvit_cfg()
    cfg.TRAIN.ENABLE = False
    cfg.TEST.DATASET = "synthetic"
    cfg.TEST.BATCH_SIZE = 4
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.NUM_GPUS = 1
    cfg.LOG_MODEL_INFO = False
    cfg.OUTPUT_DIR = str(tmp_path)
    assert_and_infer_cfg(cfg)
    results = test(cfg)
    stats = results[0][1]
    assert "top1_acc" in stats


def test_mvit_train_e2e(tmp_path):
    """One MViT training epoch (droppath + dropout rngs, mean-pool head)."""
    from tools.train_net import train
    from vtm.config import assert_and_infer_cfg

    cfg = _mvit_cfg()
    cfg.merge_from_list([
        "TRAIN.DATASET", "synthetic",
        "TRAIN.BATCH_SIZE", "8",
        "SOLVER.MAX_EPOCH", "1",
        "SOLVER.OPTIMIZING_METHOD", "adamw",
        "TRAIN.EVAL_PERIOD", "1",
        "TRAIN.CHECKPOINT_PERIOD", "10",
        "MVIT.DROPPATH_RATE", "0.1",
        "MODEL.DROPOUT_RATE", "0.5",
        "DATA_LOADER.NUM_WORKERS", "0",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    params = train(cfg)
    assert params is not None


def test_mvit_act_checkpoint_grad_parity():
    """MODEL.ACT_CHECKPOINT (jax.checkpoint remat) must not change
    values or gradients — only the memory/recompute trade."""
    import jax
    import jax.numpy as jnp
    import torch

    from vtm.models.build import build_model

    cfg = _mvit_cfg()
    bundle = build_model(cfg)
    cfg2 = _mvit_cfg()
    cfg2.MODEL.ACT_CHECKPOINT = True
    remat_bundle = build_model(cfg2, init=False)
    remat_bundle.params = bundle.params

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 32, 32, 3)),
        jnp.float32,
    )

    def loss(b):
        def f(p):
            logits, _ = b.module.apply({"params": p}, x)
            return (logits ** 2).sum()
        return f

    v1, g1 = jax.value_and_grad(loss(bundle))(bundle.params)
    v2, g2 = jax.value_and_grad(loss(remat_bundle))(remat_bundle.params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
