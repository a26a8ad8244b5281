"""LARS + param-grouping parity vs the reference optimizer
(slowfast/models/optimizer.py:11-148, 269-360).

Builds a tiny torch model with all three reference param groups (BN,
regular weights, 1-D/bias), runs the reference construct_optimizer
(LARS_ON) for two steps with fixed grads, and checks our optax chain
produces identical parameter updates from the same values.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import load_reference_module  # noqa: E402


def _tiny_torch_model():
    import torch.nn as nn

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv3d(2, 3, 1, bias=False)
            self.bn = nn.BatchNorm3d(3)
            self.head = nn.Linear(3, 4)

    m = M()
    torch.manual_seed(0)
    for p in m.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p))
    return m


def _cfg(zero_wd_1d: bool, lars_on: bool, method: str = "sgd"):
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = method
    cfg.SOLVER.BASE_LR = 0.05
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.SOLVER.COSINE_END_LR = 0.0
    cfg.SOLVER.MAX_EPOCH = 10
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = True
    cfg.SOLVER.WEIGHT_DECAY = 0.02
    cfg.BN.WEIGHT_DECAY = 0.1
    cfg.SOLVER.ZERO_WD_1D_PARAM = zero_wd_1d
    cfg.SOLVER.LARS_ON = lars_on
    cfg.SOLVER.CLIP_GRAD_L2NORM = None
    cfg.SOLVER.CLIP_GRAD_VAL = None
    cfg.SOLVER.LAYER_DECAY = 1.0
    cfg.NUM_GPUS = 1
    cfg.MODEL.MODEL_NAME = "VideoMAE"  # no no_weight_decay() set
    return cfg


def _torch_two_steps(model, cfg, grads):
    ref_opt = load_reference_module(
        "slowfast/models/optimizer.py", "ref_slowfast_optimizer"
    )
    opt = ref_opt.construct_optimizer(model, cfg)
    outs = []
    for _ in range(2):
        opt.zero_grad()
        for (name, p) in model.named_parameters():
            p.grad = torch.from_numpy(grads[name]).clone()
        opt.step()
        outs.append(
            {n: p.detach().numpy().copy() for n, p in model.named_parameters()}
        )
    return outs


def _jax_two_steps(params0, cfg, grads, names):
    import jax.numpy as jnp

    from vtm.train.optimizer import construct_optimizer

    params = {
        "conv": {"kernel": jnp.asarray(params0["conv.weight"])},
        "bn": {
            "scale": jnp.asarray(params0["bn.weight"]),
            "bias": jnp.asarray(params0["bn.bias"]),
        },
        "head": {
            "kernel": jnp.asarray(params0["head.weight"]),
            "bias": jnp.asarray(params0["head.bias"]),
        },
    }
    gtree = {
        "conv": {"kernel": jnp.asarray(grads["conv.weight"])},
        "bn": {
            "scale": jnp.asarray(grads["bn.weight"]),
            "bias": jnp.asarray(grads["bn.bias"]),
        },
        "head": {
            "kernel": jnp.asarray(grads["head.weight"]),
            "bias": jnp.asarray(grads["head.bias"]),
        },
    }
    tx, _ = construct_optimizer(cfg, params)
    state = tx.init(params)
    import optax

    outs = []
    for _ in range(2):
        updates, state = tx.update(gtree, state, params)
        params = optax.apply_updates(params, updates)
        outs.append(
            {
                "conv.weight": np.asarray(params["conv"]["kernel"]),
                "bn.weight": np.asarray(params["bn"]["scale"]),
                "bn.bias": np.asarray(params["bn"]["bias"]),
                "head.weight": np.asarray(params["head"]["kernel"]),
                "head.bias": np.asarray(params["head"]["bias"]),
            }
        )
    return outs


@pytest.mark.parametrize("zero_wd_1d", [False, True])
@pytest.mark.parametrize("lars_on", [False, True])
def test_lars_and_grouping_update_parity(zero_wd_1d, lars_on):
    model = _tiny_torch_model()
    cfg = _cfg(zero_wd_1d, lars_on)
    rng = np.random.default_rng(1)
    grads = {
        n: rng.standard_normal(p.shape).astype(np.float32)
        for n, p in model.named_parameters()
    }
    params0 = {n: p.detach().numpy().copy() for n, p in model.named_parameters()}

    ref_steps = _torch_two_steps(model, cfg, grads)
    got_steps = _jax_two_steps(params0, cfg, grads, list(grads))

    for step, (ref, got) in enumerate(zip(ref_steps, got_steps)):
        for name in ref:
            np.testing.assert_allclose(
                got[name],
                ref[name],
                rtol=2e-5,
                atol=2e-6,
                err_msg=f"step {step} param {name} "
                f"(zero_wd_1d={zero_wd_1d}, lars_on={lars_on})",
            )


def test_lars_ignores_1d_and_bn():
    """Under LARS the BN group must be untouched by the adaptive scale
    (apply_LARS=False) and 1-D params pass through (ignore_1d_param).
    Verified indirectly via parity above; here: the wd tree exposes the
    grouping (BN -> BN.WEIGHT_DECAY, zero-group -> 0, rest -> wd)."""
    import jax

    from vtm.train.optimizer import _is_bn, _is_zero_wd

    cfg = _cfg(zero_wd_1d=True, lars_on=True)
    params = {
        "blocks_0": {"attn": {"qkv": {"kernel": np.zeros((4, 4))}},
                     "a_bn": {"scale": np.zeros((4,))}},
        "head": {"bias": np.zeros((4,))},
    }
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    meta = {
        "/".join(str(getattr(k, "key", k)) for k in path): (
            _is_bn(path), _is_zero_wd(cfg, path, leaf)
        )
        for path, leaf in flat
    }
    assert meta["blocks_0/a_bn/scale"][0] is True
    assert meta["blocks_0/attn/qkv/kernel"] == (False, False)
    assert meta["head/bias"][1] is True
