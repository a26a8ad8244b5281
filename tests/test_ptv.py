"""PTV families: native CSN and R(2+1)D + PTV registry aliases.

Parity target: /root/reference/slowfast/models/ptv_model_builder.py
(PTVCSN :150-232, PTVR2plus1D :235-333) and
/root/reference/slowfast/datasets/ptv_datasets.py (registry names).
pytorchvideo is absent from this image, so these are structural and
behavioral tests of the natively implemented architectures (the torch
oracle cannot build the PTV models either — see vtm/models/ptv.py
docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtm.config import assert_and_infer_cfg, get_cfg
from vtm.models import build_model


def _cfg(name, depth=50, wpg=8, frames=8, crop=64, classes=7):
    cfg = get_cfg()
    cfg.merge_from_list([
        "MODEL.MODEL_NAME", name,
        "MODEL.NUM_CLASSES", str(classes),
        "RESNET.DEPTH", str(depth),
        "RESNET.WIDTH_PER_GROUP", str(wpg),
        "DATA.NUM_FRAMES", str(frames),
        "DATA.TRAIN_CROP_SIZE", str(crop),
        "DATA.TEST_CROP_SIZE", str(crop),
    ])
    assert_and_infer_cfg(cfg)
    return cfg


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 8, 64, 64, 3)), jnp.float32)


def test_csn_forward_and_depthwise(clip):
    b = build_model(_cfg("PTVCSN"))
    out, _ = b.module.apply(b.variables, [clip], train=False)
    assert out.shape == (2, 7)
    # eval head applies softmax (MODEL.HEAD_ACT default)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    # conv_b is channel-separated: in_features/groups == 1
    # (stage_conv_b_width_per_group=1, ptv_model_builder.py:207)
    for stage in ("s2", "s3", "s4", "s5"):
        kb = b.params[stage]["res_0"]["branch2"]["conv_b"]["kernel"]
        assert kb.shape[:4] == (3, 3, 3, 1), (stage, kb.shape)


def test_csn_stage_depths_match_table():
    b = build_model(_cfg("PTVCSN", depth=50), init=False)
    params = b.module.init(jax.random.key(0), [jnp.zeros((1, 8, 64, 64, 3))])
    p = params["params"]
    # R50 table (3, 4, 6, 3) — pytorchvideo _MODEL_STAGE_DEPTH
    for stage, depth in zip(("s2", "s3", "s4", "s5"), (3, 4, 6, 3)):
        blocks = [k for k in p[stage] if k.startswith("res_")]
        assert len(blocks) == depth, (stage, blocks)


def test_r2plus1d_forward_and_factorisation(clip):
    b = build_model(_cfg("PTVR2plus1D"))
    out, _ = b.module.apply(b.variables, [clip], train=False)
    assert out.shape == (2, 7)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    # conv_b factorised: 1x3x3 spatial then 3x1x1 temporal, inner width
    # = dim_inner (create_2plus1d_bottleneck_block args,
    # ptv_model_builder.py:292-311)
    blk = b.params["s2"]["res_0"]["branch2"]
    assert blk["conv_b_xy"]["kernel"].shape[:3] == (1, 3, 3)
    assert blk["conv_b_t"]["kernel"].shape[:3] == (3, 1, 1)
    assert "conv_b_xy_bn" in blk  # BN+ReLU between the two factors


def test_r2plus1d_temporal_stride_schedule(clip):
    """Temporal strides (1,1,2,2): T=8 must survive to s3 and halve
    twice after (head pool kernel T/4, ptv_model_builder.py:313-317)."""
    b = build_model(_cfg("PTVR2plus1D"))
    _, state = b.module.apply(
        b.variables, [clip], train=False,
        capture_intermediates=lambda mdl, name: name == "__call__",
    )
    inter = state["intermediates"]
    t_sizes = {
        stage: inter[stage]["__call__"][0].shape[1]
        for stage in ("s2", "s3", "s4", "s5")
    }
    assert t_sizes == {"s2": 8, "s3": 8, "s4": 4, "s5": 2}, t_sizes


def test_csn_train_step_updates_bn_and_grads_flow(clip):
    b = build_model(_cfg("PTVCSN"))
    labels = jnp.array([1, 3])

    def loss_fn(params):
        (logits, _), _ = b.module.apply(
            {"params": params, "batch_stats": b.batch_stats},
            [clip], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
        )
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return -(jax.nn.log_softmax(logits) * onehot).sum(-1).mean()

    loss, grads = jax.value_and_grad(loss_fn)(b.params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # gradient reaches the stem
    stem_g = np.abs(np.asarray(grads["stem_conv"]["kernel"])).max()
    assert stem_g > 0

    # BN running stats move under train=True
    _, new_state = b.module.apply(
        {"params": b.params, "batch_stats": b.batch_stats},
        [clip], train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(0)},
    )
    old = np.asarray(b.batch_stats["stem_bn"]["mean"])
    new = np.asarray(new_state["batch_stats"]["stem_bn"]["mean"])
    assert not np.allclose(old, new)


@pytest.mark.parametrize(
    "ptv_name,native_module",
    [
        ("PTVX3D", "X3DModel"),
        ("PTVSlowFast", "SlowFastModel"),
        ("PTVResNet", "ResNetModel"),
    ],
)
def test_ptv_aliases_build_native_models(ptv_name, native_module):
    cfg = _cfg(ptv_name, classes=5)
    b = build_model(cfg, init=False)
    assert type(b.module).__name__ == native_module
    assert b.name == ptv_name


def test_ptv_dataset_names_registered():
    from vtm.data import DATASET_REGISTRY
    from vtm.data.charades import Charades
    from vtm.data.kinetics import Kinetics
    from vtm.data.ssv2 import Ssv2

    assert issubclass(DATASET_REGISTRY["ptvkinetics"], Kinetics)
    assert issubclass(DATASET_REGISTRY["ptvcharades"], Charades)
    assert issubclass(DATASET_REGISTRY["ptvssv2"], Ssv2)


def test_ptv_detection_raises_like_reference():
    cfg = _cfg("PTVCSN")
    cfg.DETECTION.ENABLE = True
    with pytest.raises(NotImplementedError):
        build_model(cfg, init=False)
