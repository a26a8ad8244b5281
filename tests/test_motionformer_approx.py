"""Approximate-attention parity vs the reference torch helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import load_reference_module
from vtm.models import motionformer_approx as approx


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_nystrom():
    return load_reference_module(
        "slowfast/models/motionformer_nystrom_helper.py", "ref_nystrom"
    )


@pytest.fixture(scope="module")
def ref_ortho():
    return load_reference_module(
        "slowfast/models/motionformer_orthoformer_helper.py", "ref_ortho"
    )


@pytest.fixture(scope="module")
def ref_performer():
    return load_reference_module(
        "slowfast/models/motionformer_performer_helper.py", "ref_performer"
    )


def _qkv(b=2, f=4, p=10, d=16, seed=0):
    rng = np.random.default_rng(seed)
    n = f * p
    return [rng.standard_normal((b, n, d)).astype(np.float32) for _ in range(3)]


@pytest.mark.parametrize("p,landmarks", [(10, 8), (12, 8)])
def test_nystrom_matches_reference(torch, ref_nystrom, p, landmarks):
    q, k, v = _qkv(p=p)
    f = 4
    ref = ref_nystrom.nystrom_spatial_attn(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        landmarks=landmarks, num_frames=f, inv_iters=6,
        use_spatial_landmarks=True,
    ).numpy()
    got = np.asarray(
        approx.nystrom_spatial_attn(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            landmarks=landmarks, num_frames=f, inv_iters=6,
            use_spatial_landmarks=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_orthoformer_matches_reference(torch, ref_ortho):
    q, k, v = _qkv(seed=1)
    f, landmarks = 4, 6
    b, n, _ = q.shape
    # pin the reference's random initial landmark, then replay it
    torch.manual_seed(0)
    init = torch.randint(n, (b, 1, 1)).view(-1).numpy()
    torch.manual_seed(0)
    ref = ref_ortho.orthoformer(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        num_landmarks=landmarks, num_frames=f,
    ).numpy()
    got = np.asarray(
        approx.orthoformer(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            num_landmarks=landmarks, num_frames=f,
            init_idx=jnp.asarray(init),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_performer_kernel_transform_matches_reference(torch, ref_performer):
    rng = np.random.default_rng(2)
    b, n, h, d, m = 2, 12, 3, 16, 32
    data = rng.standard_normal((b, n, h, d)).astype(np.float32)
    proj = rng.standard_normal((m, d)).astype(np.float32)
    for is_query in (True, False):
        ref = ref_performer.softmax_kernel_transformation(
            torch.tensor(data), is_query, torch.tensor(proj)
        ).numpy()
        got = np.asarray(
            approx.softmax_kernel_transformation(
                jnp.asarray(data), is_query, jnp.asarray(proj)
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_projection_matrix_block_orthogonal():
    proj = np.asarray(approx.create_projection_matrix(32, 16, jax.random.key(0)))
    assert proj.shape == (32, 16)
    # each 16x16 block has orthogonal directions
    for blk in (proj[:16], proj[16:]):
        dirs = blk / np.linalg.norm(blk, axis=1, keepdims=True)
        np.testing.assert_allclose(dirs @ dirs.T, np.eye(16), atol=1e-5)


def test_performer_attention_matches_reference_pipeline(torch, ref_performer):
    """Same projection matrix -> the FAVOR+ einsum chain must equal the
    reference's (motionformer_vit_helper.py:207-233)."""
    q, k, v = _qkv(b=2, f=2, p=8, d=16, seed=3)
    f, m = 2, 32
    rng = np.random.default_rng(4)
    proj = rng.standard_normal((m, 16)).astype(np.float32)

    # reference chain (torch)
    tq, tk, tv = (torch.tensor(t) for t in (q, k, v))
    q_p = ref_performer.softmax_kernel_transformation(
        tq.unsqueeze(2), True, torch.tensor(proj)
    )[:, :, 0]
    k_p = ref_performer.softmax_kernel_transformation(
        tk.unsqueeze(2), False, torch.tensor(proj)
    )[:, :, 0]
    b, n, _ = q.shape
    k_f = k_p.reshape(b, f, n // f, m)
    v_f = tv.reshape(b, f, n // f, 16)
    kv = torch.einsum("bfnr,bfnd->bfrd", k_f, v_f)
    qkv = torch.einsum("bpr,bfrd->bpfd", q_p, kv)
    norm = torch.einsum("bpr,bfr->bpf", q_p, torch.einsum("bfnr->bfr", k_f))
    ref = (qkv / norm.unsqueeze(-1)).numpy()

    # ours, with the projection injected
    import unittest.mock as mock

    with mock.patch.object(
        approx, "create_projection_matrix", lambda m_, d_, rng_: jnp.asarray(proj)
    ):
        got = np.asarray(
            approx.performer_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), f, m=m,
                rng=jax.random.key(0),
            )
        )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_motionformer_approx_forward_runs():
    from vtm.merge.policy import MergePolicy
    from vtm.models.motionformer import Motionformer, MotionformerConfig

    for attn_type in ("nystrom", "orthoformer", "performer"):
        cfg = MotionformerConfig(
            img_size=32, num_classes=5, embed_dim=32, depth=2, num_heads=2,
            temporal_resolution=2, approx_attn_type=attn_type,
            approx_attn_dim=4,
        )
        model = Motionformer(config=cfg, policy=MergePolicy(rs=(1, 1), mode="merge"))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 4, 32, 32, 3)), jnp.float32
        )
        probs, _ = model.apply(
            {"params": model.init(jax.random.key(0), x)["params"]}, x
        )
        arr = np.asarray(probs)
        assert arr.shape == (1, 5) and np.isfinite(arr).all()
