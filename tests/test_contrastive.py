"""Contrastive SSL parity vs the reference ContrastiveModel.

The reference hardcodes .cuda() on tensors created inside forward
(contrastive.py:21, 586-593, …); the oracle runs with Tensor.cuda /
Module.cuda patched to no-ops (pure CPU math, same values)."""

import numpy as np
import pytest

from test_convnet import _install_native_stubs, tiny_cfg  # noqa: F401


@pytest.fixture(scope="module")
def ref_contrastive():
    import torch

    _install_native_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from conftest import load_reference_module

    return load_reference_module(
        "slowfast/models/contrastive.py", "ref_contrastive"
    )


def _ssl_cfg(ctype, **over):
    cfg = tiny_cfg("ContrastiveModel", "slow")
    cfg.MODEL.NUM_CLASSES = 8  # projection dim
    cfg.MODEL.LOSS_FUNC = "contrastive_loss"
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.CONTRASTIVE.TYPE = ctype
    cfg.CONTRASTIVE.DIM = 8
    cfg.CONTRASTIVE.QUEUE_LEN = 16
    cfg.CONTRASTIVE.LENGTH = 12
    cfg.CONTRASTIVE.T = 0.07
    cfg.CONTRASTIVE.MOMENTUM = 0.5
    cfg.CONTRASTIVE.KNN_ON = True
    for k, v in over.items():
        cfg.merge_from_list(
            [k, repr(v) if isinstance(v, (list, tuple)) else str(v)]
        )
    return cfg


def _build_pair(ref_contrastive, cfg):
    """Reference model (train mode) + converted vtm model/params/state."""
    import torch
    import jax

    from vtm.checkpoints.convert import convert_pyslowfast
    from vtm.models.contrastive import build_contrastive_model

    torch.manual_seed(0)
    ref = ref_contrastive.ContrastiveModel(cfg).train()
    model, bundle = build_contrastive_model(cfg, init=False)
    params, stats = convert_pyslowfast(ref.backbone.state_dict())
    state = model.init_state(params, stats, jax.random.key(0))
    if hasattr(ref, "queue_x"):
        state["queue_x"] = ref.queue_x.detach().numpy().copy()
    if model.cc.knn_on:
        state["knn_mem"] = (
            ref.knn_mem.memory.detach().numpy().copy()
            .reshape(cfg.CONTRASTIVE.LENGTH, -1)
        )
    return ref, model, params, stats, state


def _clips(n_clips, b=2, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    return [
        [torch.randn(b, 3, 8, 32, 32, generator=g)] for _ in range(n_clips)
    ]


def _to_jax_clips(clips):
    import jax.numpy as jnp

    return [
        [jnp.asarray(np.transpose(p.numpy(), (0, 2, 3, 4, 1))) for p in c]
        for c in clips
    ]


def test_moco_forward_parity(ref_contrastive):
    import torch
    import jax.numpy as jnp

    cfg = _ssl_cfg("moco")
    ref, model, params, stats, state = _build_pair(ref_contrastive, cfg)
    clips = _clips(2)
    index = torch.arange(2)
    time = torch.zeros(2, 2, 2)
    with torch.no_grad():
        want_logits, want_loss = ref(
            [c for c in clips], index=index, time=time, epoch_exact=0.0
        )

    logits, loss, aux = model.forward_train(
        params, stats, state, _to_jax_clips(clips), jnp.asarray(index.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(logits), want_logits.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        float(loss), float(want_loss), atol=2e-4, rtol=1e-3
    )
    # queue advanced identically (keys[0] written at ptr 0)
    np.testing.assert_allclose(
        np.asarray(aux["new_state"]["queue_x"]),
        ref.queue_x.detach().numpy(), atol=2e-4, rtol=1e-3,
    )
    assert int(aux["new_state"]["ptr"]) == int(ref.ptr[0])
    # knn bank updated at the clip indices
    np.testing.assert_allclose(
        np.asarray(aux["new_state"]["knn_mem"]),
        ref.knn_mem.memory.detach().numpy().reshape(12, -1),
        atol=2e-4, rtol=1e-3,
    )


def test_moco_momentum_encoder_follows(ref_contrastive):
    """Second forward: hist params EMA + queue ptr advance."""
    import torch
    import jax.numpy as jnp

    cfg = _ssl_cfg("moco")
    ref, model, params, stats, state = _build_pair(ref_contrastive, cfg)
    clips1, clips2 = _clips(2, seed=0), _clips(2, seed=1)
    index = torch.arange(2)
    time = torch.zeros(2, 2, 2)
    with torch.no_grad():
        ref(clips1, index=index, time=time, epoch_exact=0.0)
        want_logits, want_loss = ref(
            clips2, index=index, time=time, epoch_exact=0.0
        )

    jidx = jnp.asarray(index.numpy())
    _, _, aux1 = model.forward_train(
        params, stats, state, _to_jax_clips(clips1), jidx
    )
    logits, loss, aux2 = model.forward_train(
        params, aux1["new_bn"], aux1["new_state"], _to_jax_clips(clips2),
        jidx,
    )
    np.testing.assert_allclose(
        np.asarray(logits), want_logits.numpy(), atol=5e-4, rtol=1e-3
    )
    assert int(aux2["new_state"]["ptr"]) == int(ref.ptr[0]) == 4


def test_byol_forward_parity(ref_contrastive):
    import torch
    import jax.numpy as jnp

    cfg = _ssl_cfg(
        "byol",
        **{
            "CONTRASTIVE.NUM_MLP_LAYERS": 2,
            "CONTRASTIVE.MLP_DIM": 16,
            "CONTRASTIVE.PREDICTOR_DEPTHS": [2],
        },
    )
    ref, model, params, stats, state = _build_pair(ref_contrastive, cfg)
    clips = _clips(2)
    index = torch.arange(2)
    time = torch.zeros(2, 2, 2)
    with torch.no_grad():
        _, want_loss = ref(
            clips, index=index, time=time, epoch_exact=0.0
        )
    _, loss, _ = model.forward_train(
        params, stats, state, _to_jax_clips(clips), jnp.asarray(index.numpy())
    )
    np.testing.assert_allclose(
        float(loss), float(want_loss), atol=5e-4, rtol=1e-3
    )


def test_simclr_forward_parity(ref_contrastive):
    import torch
    import jax.numpy as jnp

    cfg = _ssl_cfg("simclr", **{"CONTRASTIVE.SIMCLR_DIST_ON": False})
    ref, model, params, stats, state = _build_pair(ref_contrastive, cfg)
    clips = _clips(2)
    index = torch.arange(2)
    time = torch.zeros(2, 2, 2)
    with torch.no_grad():
        _, want_loss = ref(clips, index=index, time=time, epoch_exact=0.0)
    _, loss, _ = model.forward_train(
        params, stats, state, _to_jax_clips(clips), jnp.asarray(index.numpy())
    )
    np.testing.assert_allclose(
        float(loss), float(want_loss), atol=5e-4, rtol=1e-3
    )


def test_swav_forward_parity(ref_contrastive):
    import torch
    import jax.numpy as jnp

    cfg = _ssl_cfg("swav")
    ref, model, params, stats, state = _build_pair(ref_contrastive, cfg)
    proto = {"kernel": ref.swav_prototypes.weight.detach().numpy().T.copy()}
    clips = _clips(2)
    index = torch.arange(2)
    time = torch.zeros(2, 2, 2)
    with torch.no_grad():
        _, want_loss = ref(clips, index=index, time=time, epoch_exact=0.0)

    from vtm.models.contrastive import normalize_swav_prototypes

    _, loss, _ = model.forward_train(
        params, stats, state, _to_jax_clips(clips),
        jnp.asarray(index.numpy()), epoch_exact=0.0,
        proto_params=normalize_swav_prototypes(proto),
    )
    np.testing.assert_allclose(
        float(loss), float(want_loss), atol=5e-4, rtol=1e-3
    )
    # the reference normalised its stored prototypes in place — ours is
    # the same row normalisation
    np.testing.assert_allclose(
        normalize_swav_prototypes(proto)["kernel"].T,
        ref.swav_prototypes.weight.detach().numpy(), atol=1e-6,
    )


def test_memory_bank_math_matches_reference(ref_contrastive):
    """Memory1D get/update parity on fixed indices."""
    import torch

    from vtm.models.contrastive import memory_get, memory_update

    cfg = _ssl_cfg("mem")
    ref_mem = ref_contrastive.Memory1D(12, 1, 8, cfg)
    bank = np.random.default_rng(0).standard_normal((12, 8)).astype(np.float32)
    ref_mem.memory.copy_(torch.from_numpy(bank))

    ind = torch.tensor([3, 7])
    got = memory_get(bank, ind.numpy())
    want = ref_mem.get(ind, torch.zeros(2))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-6)

    q = np.random.default_rng(1).standard_normal((2, 8)).astype(np.float32)
    ref_mem.update(torch.from_numpy(q), momentum=0.5, ind=ind,
                   time=torch.zeros(2))
    new_bank = memory_update(bank, q, 0.5, ind.numpy())
    np.testing.assert_allclose(
        np.asarray(new_bank), ref_mem.memory.numpy(), atol=1e-5
    )


def test_contrastive_train_step_e2e():
    """make_contrastive_train_step: moco over several steps on the CPU
    mesh — loss finite, queue ptr cycles, hist params track the online
    encoder, the warm-up (update_param=False) leaves params frozen."""
    import jax
    import jax.numpy as jnp
    import optax

    from vtm.checkpoints import convert  # noqa: F401 (keep import graph warm)
    from vtm.models.contrastive import (
        build_contrastive_model, moco_iters_noupdate,
    )
    from vtm.train.train_step import make_contrastive_train_step

    cfg = _ssl_cfg("moco")
    model, bundle = build_contrastive_model(cfg, init=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32, 3)), jnp.float32)
    variables = bundle.module.init(jax.random.key(0), [x], train=False)
    params, stats = variables["params"], variables.get("batch_stats")
    state = model.init_state(params, stats, jax.random.key(1))

    tx = optax.sgd(0.05)
    step = make_contrastive_train_step(model, tx)
    all_params = {"backbone": params}
    opt_state = tx.init(all_params)
    index = jnp.asarray([0, 1])

    warmup = moco_iters_noupdate(model.cc, 2)
    assert warmup == 8
    clips = [[x], [x[:, ::-1]]]
    p0 = jax.tree.leaves(all_params)[0].copy()
    all_params, stats, state, opt_state, loss, _ = step(
        all_params, stats, state, opt_state, clips, index, 0.0,
        jax.random.key(2), update_param=False,
    )
    assert np.allclose(jax.tree.leaves(all_params)[0], p0)  # frozen
    assert int(state["ptr"]) == 2  # queue still fills
    losses = []
    for i in range(3):
        all_params, stats, state, opt_state, loss, _ = step(
            all_params, stats, state, opt_state, clips, index,
            1.0 + i * 0.1, jax.random.key(3 + i), update_param=True,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert not np.allclose(jax.tree.leaves(all_params)[0], p0)
    assert int(state["ptr"]) == 8
    assert int(state["iter"]) == 4
    # hist params have moved off the init copy (EMA active)
    h = jax.tree.leaves(state["hist_params"])[0]
    b = jax.tree.leaves(all_params["backbone"])[0]
    assert not np.allclose(h, b)


def test_swav_train_step_with_queue():
    """SwAV e2e with an active assignment queue + prototype grad gate."""
    import jax
    import jax.numpy as jnp
    import optax

    from vtm.models.contrastive import build_contrastive_model
    from vtm.train.train_step import make_contrastive_train_step

    cfg = _ssl_cfg("swav", **{"CONTRASTIVE.SWAV_QEUE_LEN": 4})
    model, bundle = build_contrastive_model(cfg, init=False)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 32, 32, 3)),
        jnp.float32,
    )
    variables = bundle.module.init(jax.random.key(0), [x], train=False)
    params, stats = variables["params"], variables.get("batch_stats")
    state = model.init_state(params, stats, jax.random.key(1))
    proto = model.init_swav_prototypes(jax.random.key(2))

    tx = optax.sgd(0.05)
    step = make_contrastive_train_step(model, tx)
    all_params = {"backbone": params, "swav_prototypes": proto}
    opt_state = tx.init(all_params)
    clips = [[x], [x[:, ::-1]]]
    index = jnp.asarray([0, 1])

    proto0 = np.asarray(all_params["swav_prototypes"]["kernel"]).copy()
    # first-epoch step: prototype grads gated to zero
    all_params, stats, state, opt_state, loss, _ = step(
        all_params, stats, state, opt_state, clips, index, 0.5,
        jax.random.key(3),
    )
    from vtm.models.contrastive import normalize_swav_prototypes

    np.testing.assert_allclose(
        np.asarray(all_params["swav_prototypes"]["kernel"]),
        np.asarray(normalize_swav_prototypes({"kernel": proto0})["kernel"]),
        atol=1e-6,
    )
    # past the queue warm-up epoch: queue fills and is consumed
    for i in range(3):
        all_params, stats, state, opt_state, loss, _ = step(
            all_params, stats, state, opt_state, clips, index, 16.0 + i,
            jax.random.key(4 + i),
        )
        assert np.isfinite(float(loss))
    assert bool(state["swav_use_the_queue"])
    assert not np.allclose(
        np.asarray(state["queue_swav"]), 0.0
    )


def test_knn_eval():
    import jax

    from vtm.models.contrastive import build_contrastive_model, l2_normalize

    cfg = _ssl_cfg("moco")
    model, bundle = build_contrastive_model(cfg, init=False)
    import jax.numpy as jnp

    state = {"knn_mem": l2_normalize(jnp.asarray(
        np.random.default_rng(0).standard_normal((12, 8)), jnp.float32
    ))}
    q = state["knn_mem"][3:5]
    yd, yi = model.eval_knn(state, q, knn_k=3)
    assert yi.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(yi[:, 0]), [3, 4])


def test_ssl_train_loop_e2e(tmp_path):
    """Full tools/train_net.py SSL path on the synthetic multi-view
    dataset: moco pretraining epoch + kNN eval + checkpoint."""
    from tools.train_net import train
    from vtm.config import assert_and_infer_cfg

    cfg = _ssl_cfg("moco")
    cfg.merge_from_list([
        "TRAIN.ENABLE", "True",
        "TRAIN.DATASET", "synthetic",
        "TRAIN.BATCH_SIZE", "4",
        "CONTRASTIVE.QUEUE_LEN", "8",
        "CONTRASTIVE.NUM_CLASSES_DOWNSTREAM", "7",
        "DATA.TRAIN_CROP_NUM_TEMPORAL", "2",
        "SOLVER.MAX_EPOCH", "1",
        "SOLVER.OPTIMIZING_METHOD", "sgd",
        "SOLVER.BASE_LR", "0.01",
        "TRAIN.EVAL_PERIOD", "1",
        "TRAIN.CHECKPOINT_PERIOD", "1",
        "DATA_LOADER.NUM_WORKERS", "0",
        "NUM_GPUS", "1",
        "OUTPUT_DIR", str(tmp_path),
    ])
    assert_and_infer_cfg(cfg)
    params = train(cfg)
    assert params is not None and "backbone" in params
    import os

    assert any("checkpoint" in f for f in os.listdir(tmp_path)), (
        os.listdir(tmp_path)
    )

    # auto-resume: a second run continues from the saved epoch with the
    # FULL SSL state (queue/momentum encoder ride the checkpoint), so
    # epoch 0 is not retrained
    cfg2 = cfg.clone()
    cfg2.merge_from_list(["SOLVER.MAX_EPOCH", "2", "TRAIN.AUTO_RESUME", "True"])
    params2 = train(cfg2)
    assert params2 is not None and "backbone" in params2


def test_contrastive_mvit_backbone():
    """The 'mvit' arch from the reference's _MODEL_TYPES: MViT backbone
    with the TransformerBasicHead MLP projection (simclr branch)."""
    import jax
    import jax.numpy as jnp

    from vtm.models.contrastive import build_contrastive_model

    cfg = _ssl_cfg(
        "simclr",
        **{
            "MODEL.ARCH": "mvit",
            "CONTRASTIVE.NUM_MLP_LAYERS": 2,
            "CONTRASTIVE.MLP_DIM": 16,
        },
    )
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.PATCH_KERNEL = [3, 7, 7]
    cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.DATA.NUM_FRAMES = 4
    model, bundle = build_contrastive_model(cfg, init=False)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 32, 32, 3)),
        jnp.float32,
    )
    params = bundle.module.init(jax.random.key(0), x)["params"]
    assert "fc0" in params["head"], list(params["head"])
    state = model.init_state(params, None, jax.random.key(1))
    clips = [[x], [x[:, ::-1]]]
    _, loss, aux = model.forward_train(
        params, None, state, clips, jnp.asarray([0, 1])
    )
    assert np.isfinite(float(loss))
