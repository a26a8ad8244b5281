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

    from vtm.checkpoints.convert import convert_maskmvit
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
    params = convert_maskmvit(
        ref.state_dict(), depth=max(cfg.MASK.PRETRAIN_DEPTH) + 1
    )

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


# ---------------------------------------------------------------- MAE


def _mae_cfg():
    cfg = _mask_cfg()
    cfg.MASK.MAE_ON = True
    cfg.MASK.PRED_HOG = False
    cfg.MASK.DECODER_EMBED_DIM = 16
    cfg.MASK.DECODER_DEPTH = 0
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
    cfg.MVIT.USE_ABS_POS = True
    cfg.MVIT.SEP_POS_EMBED = False
    cfg.MVIT.USE_FIXED_SINCOS_POS = True
    cfg.AUG.MASK_RATIO = 0.75
    return cfg


def test_mae_forward_matches_reference(ref_masked):
    """MAE branch parity on the loader-mask path. torch.argsort is NOT
    stable on the binary mask noise (ties broken arbitrarily), so the
    oracle runs with a stable argsort patched in — our implementation
    always uses the stable order."""
    import torch
    import jax
    import jax.numpy as jnp

    from vtm.checkpoints.convert import convert_maskmvit
    from vtm.models.build import build_model

    cfg = _mae_cfg()
    torch.manual_seed(0)
    ref = ref_masked.MaskMViT(cfg).eval()
    x = torch.randn(2, 3, 4, 32, 32)
    # token-grid mask [B, t, h, w] with EXACTLY ratio*L ones per sample
    # (the reference derives len_keep from the mask population; ours is
    # static from AUG.MASK_RATIO — equal here by construction)
    t, h, w = 2, 4, 4
    L = t * h * w
    n_masked = int(L * cfg.AUG.MASK_RATIO)
    mrng = np.random.default_rng(3)
    mask = np.zeros((2, L), np.float32)
    for b in range(2):
        mask[b, mrng.permutation(L)[:n_masked]] = 1.0
    mask = mask.reshape(2, t, h, w)

    orig_argsort = torch.argsort
    torch.argsort = lambda *a, **k: orig_argsort(*a, stable=True, **k)
    try:
        with torch.no_grad():
            want_preds, want_labels = ref(
                [x.clone(), None, torch.from_numpy(mask)]
            )
    finally:
        torch.argsort = orig_argsort

    bundle = build_model(cfg, init=False)
    params = convert_maskmvit(
        ref.state_dict(), depth=max(cfg.MASK.PRETRAIN_DEPTH) + 1
    )

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
    preds, labels, masks = bundle.module.apply(
        {"params": params}, xs, jnp.asarray(mask)
    )
    for i, (want, got, m) in enumerate(zip(want_preds, preds, masks)):
        got_masked = np.asarray(got)[np.asarray(m)]
        np.testing.assert_allclose(
            got_masked, want.numpy(), atol=3e-4, rtol=1e-3,
            err_msg=f"preds {i}",
        )
    for i, ((want_lab, _w), got_lab, m) in enumerate(
        zip(want_labels, labels, masks)
    ):
        got_masked = np.asarray(got_lab)[np.asarray(m)]
        np.testing.assert_allclose(
            got_masked, want_lab.numpy(), atol=1e-4, rtol=1e-3,
            err_msg=f"labels {i}",
        )


def test_mae_random_masking_and_train_step():
    """MAE with MAE_RND_MASK: derived mask has the static count; a
    train step runs and the loss is finite and decreases over steps."""
    import jax
    import jax.numpy as jnp
    import optax

    from vtm.models.build import build_model
    from vtm.train.train_step import make_mae_train_step

    cfg = _mae_cfg()
    cfg.MASK.MAE_RND_MASK = True
    bundle = build_model(cfg, init=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    params = bundle.module.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x
    )["params"]
    preds, labels, masks = bundle.module.apply(
        {"params": params}, x, rngs={"mask": jax.random.key(2)}
    )
    L = 2 * 4 * 4
    n_masked = int(L * cfg.AUG.MASK_RATIO)
    counts = np.asarray(masks[0]).sum(axis=1)
    np.testing.assert_array_equal(counts, n_masked)
    assert preds[0].shape == (2, L, 8 * 8 * 3)

    tx = optax.adamw(1e-3)
    step = make_mae_train_step(bundle.module, tx)
    opt_state = tx.init(params)
    losses = []
    for i in range(4):
        params, opt_state, loss, _ = step(
            params, opt_state, x, None, jax.random.key(10 + i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_mae_per_frame_masking_shapes():
    """PER_FRAME_MASKING drops the same count per frame."""
    import jax
    import jax.numpy as jnp

    from vtm.models.build import build_model

    cfg = _mae_cfg()
    cfg.MASK.MAE_RND_MASK = True
    cfg.MASK.PER_FRAME_MASKING = True
    bundle = build_model(cfg, init=False)
    x = jnp.zeros((2, 4, 32, 32, 3))
    params = bundle.module.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x
    )["params"]
    preds, labels, masks = bundle.module.apply(
        {"params": params}, x, rngs={"mask": jax.random.key(2)}
    )
    m = np.asarray(masks[0]).reshape(2, 2, 16)  # [B, t, HW]
    per_frame = m.sum(axis=2)
    np.testing.assert_array_equal(per_frame, int(16 * 0.75))


def test_maskfeat_pixel_branch(ref_masked):
    """Non-MAE MaskFeat with pixel targets (PRED_HOG False) — label
    and prediction-shape parity vs the reference."""
    import torch
    import jax
    import jax.numpy as jnp

    from vtm.models.build import build_model
    from vtm.models.masked import maskfeat_pixel_labels

    cfg = _mask_cfg()
    cfg.MASK.PRED_HOG = False
    torch.manual_seed(0)
    ref = ref_masked.MaskMViT(cfg).eval()
    x = torch.randn(2, 3, 4, 32, 32)
    mrng = np.random.default_rng(1)
    mask = mrng.integers(0, 2, (2, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want_outputs, want_labels = ref(
            [x.clone(), None, torch.from_numpy(mask)]
        )

    bundle = build_model(cfg, init=False)
    xs = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    params = bundle.module.init(
        jax.random.key(0), xs, jnp.asarray(mask)
    )["params"]
    preds, out_masks = bundle.module.apply(
        {"params": params}, xs, jnp.asarray(mask)
    )
    for want, got in zip(want_outputs, preds):
        assert np.asarray(got).shape[-1] == want.shape[-1]
    labels = maskfeat_pixel_labels(
        bundle.module.spec, cfg.MASK.PRETRAIN_DEPTH,
        np.transpose(x.numpy(), (0, 2, 3, 4, 1)),
    )
    for i, ((want_lab, _w), got_lab, m) in enumerate(
        zip(want_labels, labels, out_masks)
    ):
        got_masked = np.asarray(got_lab)[np.asarray(m)]
        np.testing.assert_allclose(
            got_masked, want_lab.numpy(), atol=1e-4, rtol=1e-3,
            err_msg=f"labels {i}",
        )


def test_mae_visualize_roundtrip(ref_masked):
    """VIS_MASK path: patchify/unpatchify round-trips match the
    reference's _patchify/_unpatchify, and the reconstruction keeps
    visible patches bit-exact while filling dropped ones with preds."""
    import torch

    from vtm.vis.mae_vis import mae_visualize, _unpatchify
    from vtm.models.masked import _patchify_pixels

    cfg = _mae_cfg()
    torch.manual_seed(0)
    ref = ref_masked.MaskMViT(cfg).eval()
    frames = np.random.default_rng(0).standard_normal(
        (2, 4, 32, 32, 3)
    ).astype(np.float32)

    # reference patchify expects [B, C, T, H, W] with the temporal
    # subsampling already applied
    sub = frames[:, ::2]
    want_tokens = ref._patchify(
        torch.from_numpy(np.transpose(sub, (0, 4, 1, 2, 3))), p=8,
        time_stride_loss=True,
    )
    got_tokens = _patchify_pixels(sub, p=8, u=1)
    np.testing.assert_allclose(got_tokens, want_tokens.numpy(), atol=1e-6)

    want_video = ref._unpatchify(want_tokens)
    got_video = _unpatchify(np.asarray(got_tokens), t=2, h=4, w=4, u=1, p=8)
    np.testing.assert_allclose(
        got_video, np.transpose(want_video.numpy(), (0, 2, 3, 4, 1)),
        atol=1e-6,
    )

    # reconstruction semantics
    n = 2 * 4 * 4
    mask = np.zeros((2, n), np.float32)
    mask[:, : n // 2] = 1.0
    preds = np.random.default_rng(1).standard_normal(
        (2, n, 8 * 8 * 3)
    ).astype(np.float32)
    orig, masked, recon = mae_visualize(
        frames, preds, mask, patch_t_stride=2, patch=8
    )
    np.testing.assert_allclose(orig, sub)
    # visible tokens identical to the input in both masked + recon
    vis_tokens = _patchify_pixels(recon, p=8, u=1)
    np.testing.assert_allclose(
        np.asarray(vis_tokens)[mask == 0],
        np.asarray(_patchify_pixels(sub, p=8, u=1))[mask == 0],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(vis_tokens)[mask == 1], preds[mask == 1], atol=1e-6
    )
    assert (np.asarray(_patchify_pixels(masked, p=8, u=1))[mask == 1] == 0).all()
