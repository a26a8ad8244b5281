"""MaskFeat (MaskMViT) parity vs the reference torch implementation.

The reference selects masked rows with boolean indexing; vtm predicts
ALL positions and weights the loss by the mask — the tests compare the
masked subsets."""

import numpy as np
import pytest

from conftest import load_reference_module
from test_convnet import _install_native_stubs


@pytest.fixture(scope="module")
def ref_masked():
    _install_native_stubs()
    return load_reference_module("slowfast/models/masked.py", "ref_masked")


def test_hog_features_match_reference(ref_masked):
    import torch

    ops = load_reference_module("slowfast/models/operators.py", "ref_operators")
    from vtm.models.masked import hog_features

    rng = np.random.default_rng(0)
    imgs = rng.random((3, 32, 32, 3)).astype(np.float32)
    hog = ops.HOGLayerC(nbins=9, pool=8)
    with torch.no_grad():
        want = hog(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = hog_features(imgs, nbins=9, pool=8)
    np.testing.assert_allclose(got, want, atol=1e-5)


def _mask_cfg():
    from test_mvit import _mvit_cfg

    cfg = _mvit_cfg()
    cfg.MODEL.MODEL_NAME = "MaskMViT"
    cfg.MASK.ENABLE = True
    cfg.MASK.PRED_HOG = True
    cfg.MASK.PRETRAIN_DEPTH = [3]
    cfg.MASK.HEAD_TYPE = "separate"
    cfg.MVIT.PATCH_STRIDE = [2, 8, 8]  # feat stride 8 = one HOG cell
    cfg.MVIT.PATCH_KERNEL = [3, 8, 8]
    cfg.MVIT.PATCH_PADDING = [1, 0, 0]
    cfg.MVIT.POOL_Q_STRIDE = []  # keep the grid (HOG cell alignment)
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    return cfg


def test_maskfeat_forward_matches_reference(ref_masked):
    import torch
    import jax
    import jax.numpy as jnp

    from vtm.checkpoints.convert import convert_mvit, _dense, _layernorm
    from vtm.models.build import build_model

    cfg = _mask_cfg()
    torch.manual_seed(0)
    ref = ref_masked.MaskMViT(cfg).eval()
    x = torch.randn(2, 3, 4, 32, 32)
    # 3-D window mask [T', mh, mw] per sample (loader-provided path)
    mrng = np.random.default_rng(1)
    mask = mrng.integers(0, 2, (2, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want_outputs, want_labels = ref(
            [x.clone(), None, torch.from_numpy(mask)]
        )

    bundle = build_model(cfg, init=False)
    sd = ref.state_dict()
    params = convert_mvit(sd, depth=max(cfg.MASK.PRETRAIN_DEPTH) + 1)
    # prediction head: transforms are [LayerNorm] (DECODER_DEPTH 0)
    head = {}
    for i in range(len(cfg.MASK.PRETRAIN_DEPTH)):
        head[f"transform_norm_{i}"] = _layernorm(sd, f"pred_head.transforms.{i}.0")
        head[f"projections_{i}"] = _dense(sd, f"pred_head.projections.{i}")
    params["pred_head"] = head

    xs = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    init_params = bundle.module.init(
        jax.random.key(0), xs, jnp.asarray(mask)
    )["params"]
    conv_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    init_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]}
    assert conv_paths == init_paths, (
        f"missing={sorted(init_paths - conv_paths)[:8]} "
        f"extra={sorted(conv_paths - init_paths)[:8]}"
    )
    bundle.params = params
    (preds, out_masks), _ = bundle.module.apply(
        {"params": params}, xs, jnp.asarray(mask)
    ), None
    for i, (want, got, m) in enumerate(zip(want_outputs, preds, out_masks)):
        got_masked = np.asarray(got)[np.asarray(m)]
        np.testing.assert_allclose(
            got_masked, want.numpy(), atol=3e-4, rtol=1e-3, err_msg=f"depth {i}"
        )

    # HOG labels at masked positions match the reference labels
    from vtm.models.masked import maskfeat_hog_labels

    labels = maskfeat_hog_labels(
        bundle.module.spec, cfg.MASK.PRETRAIN_DEPTH,
        np.transpose(x.numpy(), (0, 2, 3, 4, 1)),
    )
    for i, ((want_lab, _w, _l), got_lab, m) in enumerate(
        zip(want_labels, labels, out_masks)
    ):
        got_masked = got_lab[np.asarray(m)]
        np.testing.assert_allclose(
            got_masked, want_lab.numpy(), atol=1e-4, err_msg=f"labels {i}"
        )


def test_maskfeat_loss_and_grad():
    """multi_mse with mask weights is finite and produces gradients."""
    import jax
    import jax.numpy as jnp

    from vtm.models.build import build_model
    from vtm.train.losses import multiple_mse

    cfg = _mask_cfg()
    bundle = build_model(cfg, init=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (2, 2, 4, 4)), jnp.float32)
    params = bundle.module.init(jax.random.key(0), x, mask)["params"]

    from vtm.models.masked import maskfeat_hog_labels

    labels = [
        jnp.asarray(l)
        for l in maskfeat_hog_labels(
            bundle.module.spec, cfg.MASK.PRETRAIN_DEPTH, np.asarray(x)
        )
    ]

    def loss_fn(p):
        preds, masks = bundle.module.apply({"params": p}, x, mask)
        loss, _ = multiple_mse(preds, [(l, 1.0) for l in labels], masks)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float((g ** 2).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0


def test_maskfeat_train_e2e(tmp_path):
    """One MaskFeat pretraining epoch on the synthetic dataset with
    loader-generated 3-D block masks."""
    from tools.train_net import train
    from vtm.config import assert_and_infer_cfg

    cfg = _mask_cfg()
    cfg.merge_from_list([
        "TRAIN.DATASET", "synthetic",
        "TRAIN.BATCH_SIZE", "4",
        "SOLVER.MAX_EPOCH", "1",
        "SOLVER.OPTIMIZING_METHOD", "adamw",
        "SOLVER.BASE_LR", "0.001",
        "TRAIN.EVAL_PERIOD", "1",
        "TRAIN.CHECKPOINT_PERIOD", "10",
        "AUG.GEN_MASK_LOADER", "True",
        "AUG.MASK_RATIO", "0.4",
        "AUG.MASK_WINDOW_SIZE", "[2, 4, 4]",
        "MODEL.LOSS_FUNC", "multi_mse",
        "DATA_LOADER.NUM_WORKERS", "0",
        "NUM_GPUS", "1",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    params = train(cfg)
    assert params is not None
