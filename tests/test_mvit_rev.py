"""Reversible MViT (MVIT.REV) parity vs the reference torch model.

Covers: forward parity on two tiny configs (conv res path / max res
path + concat pre-q fusion), checkpoint-key completeness, and
grad-equivalence of the O(1)-memory custom-VJP backward vs plain
autodiff (the reference's RevBackProp vs vanilla_backward contract)."""

import numpy as np
import pytest

from test_convnet import _install_native_stubs, ref_builder  # noqa: F401


def _rev_cfg(**over):
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
    cfg.MVIT.DEPTH = 5  # ends on a reversible layer (after transition 3)
    cfg.MVIT.PATCH_KERNEL = [3, 7, 7]
    cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.MVIT.CLS_EMBED_ON = False  # rev does not allow cls token
    cfg.MVIT.DIM_MUL = [[1, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [3, 1, 2, 2]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    cfg.MVIT.REV.ENABLE = True
    cfg.MVIT.REV.BUFFER_LAYERS = [1, 3]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    for k, v in over.items():
        cfg.merge_from_list(
            [k, repr(v) if isinstance(v, (list, tuple)) else str(v)]
        )
    return cfg


def _ref_rev_model(ref_builder, cfg):
    import torch

    torch.manual_seed(0)
    return ref_builder.MViT(cfg).eval()


def _run_rev_parity(ref_builder, cfg, atol=3e-4):
    import torch
    import jax
    import jax.numpy as jnp

    from vtm.checkpoints.convert import convert_mvit
    from vtm.models.build import build_model

    ref = _ref_rev_model(ref_builder, cfg)
    x = torch.randn(2, 3, cfg.DATA.NUM_FRAMES, 32, 32)
    with torch.no_grad():
        want = ref([x.clone()]).numpy()

    bundle = build_model(cfg, init=False)
    params = convert_mvit(ref.state_dict(), depth=cfg.MVIT.DEPTH)
    xs = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    init_params = bundle.module.init(jax.random.key(0), xs)["params"]
    conv_paths = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    init_paths = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]
    }
    assert conv_paths == init_paths, (
        f"missing={sorted(init_paths - conv_paths)[:8]} "
        f"extra={sorted(conv_paths - init_paths)[:8]}"
    )
    bundle.params = params
    got, _ = bundle.apply(xs)
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=1e-3)


def test_rev_mvit_conv_respath_parity(ref_builder):
    """Default REV config: conv res path, avg pre-q fusion, concat
    respath fuse, norm-then-mean head ordering."""
    _run_rev_parity(ref_builder, _rev_cfg())


def test_rev_mvit_concat_preq_parity(ref_builder):
    """Concat pre-q fusion + mean pooling ordering (conv res path)."""
    cfg = _rev_cfg()
    cfg.MVIT.REV.PRE_Q_FUSION = "concat"
    cfg.MVIT.USE_MEAN_POOLING = True
    _run_rev_parity(ref_builder, cfg)


def test_rev_mvit_max_respath_runs():
    """RES_PATH='max' CANNOT be oracle-tested: the reference fork's
    StageTransitionBlock reads `self.F.attn.thw` (reversible_mvit.py:414)
    but only `F.thw` is ever set (:121), so the torch path crashes with
    AttributeError. We implement the intended upstream semantics
    (stride//2-padded max pool on the residual) and check shapes."""
    import jax
    import jax.numpy as jnp

    from vtm.models.build import build_model

    cfg = _rev_cfg()
    cfg.MVIT.REV.RES_PATH = "max"
    bundle = build_model(cfg, init=False)
    x = jnp.zeros((1, cfg.DATA.NUM_FRAMES, 32, 32, 3))
    params = bundle.module.init(jax.random.key(0), x)["params"]
    out, _ = bundle.module.apply({"params": params}, x)
    assert out.shape == (1, cfg.MODEL.NUM_CLASSES)


def test_rev_mvit_v2_style_parity(ref_builder):
    """Rel-pos + residual pooling + sep pos embed flavour."""
    cfg = _rev_cfg()
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = True
    cfg.MVIT.RESIDUAL_POOLING = True
    cfg.MVIT.REL_POS_ZERO_INIT = False
    _run_rev_parity(ref_builder, cfg)


def test_rev_backward_matches_autodiff(ref_builder):
    """The custom reversible VJP must produce the same gradients as
    plain autodiff through the identical forward (the reference's
    RevBackProp vs vanilla_backward equivalence)."""
    import jax
    import jax.numpy as jnp

    from vtm.models.mvit import mvit_spec_from_cfg
    from vtm.models.mvit_rev import ReversibleMViT

    cfg = _rev_cfg()
    spec = mvit_spec_from_cfg(cfg)
    n = int(np.prod(spec.patch_dims))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, n, spec.embed_dim)),
        jnp.float32,
    )

    def grads(use_custom):
        mod = ReversibleMViT(
            spec=spec, is_training=True, use_rev_backward=use_custom
        )
        params = mod.init(jax.random.key(0), x)["params"]

        def loss(p, v):
            out = mod.apply({"params": p}, v)
            return (out ** 2).mean()

        val, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        return val, g

    v1, (gp1, gx1) = grads(True)
    v2, (gp2, gx2) = grads(False)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    np.testing.assert_allclose(gx1, gx2, rtol=1e-4, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(gp1)
    flat2 = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gp2)
    )
    assert len(flat1) == len(flat2)
    for k, v in flat1:
        np.testing.assert_allclose(
            v, flat2[jax.tree_util.keystr(k)], rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(k),
        )


def test_rev_backward_matches_autodiff_droppath(ref_builder):
    """Same equivalence with stochastic depth active (the masks are
    shared between the forward and the reconstruction, replicating the
    reference's seed-reuse)."""
    import jax
    import jax.numpy as jnp

    from vtm.models.mvit import mvit_spec_from_cfg
    from vtm.models.mvit_rev import ReversibleMViT

    cfg = _rev_cfg()
    cfg.MVIT.DROPPATH_RATE = 0.3
    spec = mvit_spec_from_cfg(cfg)
    n = int(np.prod(spec.patch_dims))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, n, spec.embed_dim)),
        jnp.float32,
    )

    def grads(use_custom):
        mod = ReversibleMViT(
            spec=spec, is_training=True, use_rev_backward=use_custom
        )
        params = mod.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(7)}, x
        )["params"]

        def loss(p, v):
            out = mod.apply(
                {"params": p}, v, rngs={"dropout": jax.random.key(7)}
            )
            return (out ** 2).mean()

        return jax.value_and_grad(loss)(params, x)

    v1, g1 = grads(True)
    v2, g2 = grads(False)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g2),
    ):
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-6, err_msg=jax.tree_util.keystr(k)
        )
