"""Parity of the JAX merge core vs the reference torch implementation
(/root/reference/tome/merge.py, imported as an oracle on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtm.merge import bipartite


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _np(t):
    return t.detach().cpu().numpy()


@pytest.mark.parametrize("class_token", [False, True])
@pytest.mark.parametrize("n,r", [(32, 8), (33, 8), (64, 31), (64, 200)])
def test_merge_wavg_matches_reference(ref_merge, class_token, n, r):
    import torch

    rng = np.random.default_rng(seed=7 * n + r + class_token)
    metric = _rand(rng, 2, n, 16)
    x = _rand(rng, 2, n, 24)

    tm, _ = ref_merge.bipartite_soft_matching(
        torch.from_numpy(metric), r, class_token=class_token
    )
    if callable(tm) and tm is ref_merge.do_nothing:
        ref_x = torch.from_numpy(x)
        ref_size = None
    else:
        ref_x, ref_size = ref_merge.merge_wavg(tm, torch.from_numpy(x))

    m = bipartite.bipartite_soft_matching(jnp.asarray(metric), r, class_token=class_token)
    got_x, got_size = bipartite.merge_wavg(m, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(got_x), _np(ref_x), rtol=2e-5, atol=2e-5)
    if ref_size is not None:
        np.testing.assert_allclose(np.asarray(got_size), _np(ref_size), rtol=0, atol=0)


def test_distill_token_layout(ref_merge):
    import torch

    rng = np.random.default_rng(3)
    metric = _rand(rng, 1, 40, 8)
    x = _rand(rng, 1, 40, 8)
    tm, _ = ref_merge.bipartite_soft_matching(
        torch.from_numpy(metric), 10, class_token=True, distill_token=True
    )
    ref_x, _ = ref_merge.merge_wavg(tm, torch.from_numpy(x))
    m = bipartite.bipartite_soft_matching(
        jnp.asarray(metric), 10, class_token=True, distill_token=True
    )
    got_x, _ = bipartite.merge_wavg(m, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_x), _np(ref_x), rtol=2e-5, atol=2e-5)


def test_unmerge_matches_reference(ref_merge):
    import torch

    rng = np.random.default_rng(11)
    metric = _rand(rng, 2, 48, 12)
    x = _rand(rng, 2, 48, 12)
    tm, tu = ref_merge.bipartite_soft_matching(torch.from_numpy(metric), 12)
    merged = tm(torch.from_numpy(x), mode="sum")
    ref_un = tu(merged)

    m = bipartite.bipartite_soft_matching(jnp.asarray(metric), 12)
    got_merged = bipartite.merge(m, jnp.asarray(x), mode="sum")
    got_un = bipartite.unmerge(m, got_merged)
    np.testing.assert_allclose(np.asarray(got_merged), _np(merged), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_un), _np(ref_un), rtol=2e-5, atol=2e-5)


def test_mean_reduce_matches_reference(ref_merge):
    import torch

    rng = np.random.default_rng(13)
    metric = _rand(rng, 1, 36, 8)
    x = _rand(rng, 1, 36, 8)
    tm, _ = ref_merge.bipartite_soft_matching(torch.from_numpy(metric), 9)
    ref_x = tm(torch.from_numpy(x), mode="mean")
    m = bipartite.bipartite_soft_matching(jnp.asarray(metric), 9)
    got = bipartite.merge(m, jnp.asarray(x), mode="mean")
    np.testing.assert_allclose(np.asarray(got), _np(ref_x), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("class_token", [False, True])
def test_drop_matches_reference(ref_merge, class_token):
    import torch

    rng = np.random.default_rng(17 + class_token)
    metric = _rand(rng, 2, 30, 10)
    x = _rand(rng, 2, 30, 10)
    td = ref_merge.bipartite_soft_matching_drop(
        torch.from_numpy(metric), 7, class_token=class_token
    )
    ref_x = td(torch.from_numpy(x))
    m = bipartite.bipartite_soft_matching_drop(
        jnp.asarray(metric), 7, class_token=class_token
    )
    got = bipartite.drop(m, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _np(ref_x), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("threshold", [-1.0, 0.0, 0.4, 0.8, 2.0])
def test_hybrid_matches_reference(ref_merge, threshold):
    import torch

    rng = np.random.default_rng(23)
    metric = _rand(rng, 2, 40, 12)
    x = _rand(rng, 2, 40, 12)
    tm, _ = ref_merge.bipartite_soft_matching_hybrid(
        torch.from_numpy(metric), 10, threshold=threshold
    )
    ref_x, ref_size = ref_merge.merge_wavg(tm, torch.from_numpy(x))
    m = bipartite.bipartite_soft_matching_hybrid(jnp.asarray(metric), 10, threshold=threshold)
    got_x, got_size = bipartite.merge_wavg(m, jnp.asarray(x), threshold=threshold)
    np.testing.assert_allclose(np.asarray(got_x), _np(ref_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_size), _np(ref_size), rtol=0, atol=0)


def test_merge_source_matches_reference(ref_merge):
    import torch

    rng = np.random.default_rng(29)
    metric = _rand(rng, 2, 32, 8)
    x = _rand(rng, 2, 32, 8)
    tm, _ = ref_merge.bipartite_soft_matching(torch.from_numpy(metric), 8)
    ref_src = ref_merge.merge_source(tm, torch.from_numpy(x))
    m = bipartite.bipartite_soft_matching(jnp.asarray(metric), 8)
    got = bipartite.merge_source(m, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _np(ref_src), rtol=0, atol=0)


def test_kth_matches_reference(ref_merge):
    import torch

    rng = np.random.default_rng(31)
    metric = _rand(rng, 2, 30, 8)
    x = _rand(rng, 2, 30, 8)
    tm, tu = ref_merge.kth_bipartite_soft_matching(torch.from_numpy(metric), 3)
    ref_x = tm(torch.from_numpy(x), mode="sum")
    ref_un = tu(ref_x)
    gm, gu = bipartite.kth_bipartite_soft_matching(jnp.asarray(metric), 3)
    got = gm(jnp.asarray(x), mode="sum")
    got_un = gu(got)
    np.testing.assert_allclose(np.asarray(got), _np(ref_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_un), _np(ref_un), rtol=2e-5, atol=2e-5)


def test_random_partition_shapes_and_conservation():
    rng = np.random.default_rng(37)
    metric = _rand(rng, 2, 24, 8)
    x = jnp.asarray(_rand(rng, 2, 24, 8))
    gm, gu = bipartite.random_bipartite_soft_matching(
        jnp.asarray(metric), 6, jax.random.key(0)
    )
    got = gm(x, mode="sum")
    assert got.shape == (2, 18, 8)
    # sum-merge conserves total mass
    np.testing.assert_allclose(
        np.asarray(got.sum(axis=1)), np.asarray(x.sum(axis=1)), rtol=1e-4, atol=1e-4
    )
    assert gu(got).shape == x.shape


def test_random_merge_shapes():
    rng = np.random.default_rng(41)
    metric = jnp.asarray(_rand(rng, 2, 32, 8))
    x = jnp.asarray(_rand(rng, 2, 32, 8))
    m = bipartite.bipartite_soft_matching(
        metric, 8, mode="random_merge", rng=jax.random.key(1)
    )
    got, size = bipartite.merge_wavg(m, x)
    assert got.shape == (2, 24, 8)
    assert np.asarray(size).sum() == 2 * 32  # sizes conserve token count


def test_r_clamp_and_identity():
    rng = np.random.default_rng(43)
    metric = jnp.asarray(_rand(rng, 1, 10, 4))
    assert bipartite.bipartite_soft_matching(metric, 0) is None
    m = bipartite.bipartite_soft_matching(metric, 100, class_token=True)
    assert m.r == (10 - 1) // 2


def test_bf16_metric_same_decisions_as_fp32():
    """The HIGHEST-precision scores matmul makes bf16-activation
    inference select the same merges as fp32 (bf16->f32 casts are
    exact, so the decision inputs are identical)."""
    import jax.numpy as jnp

    from vtm.merge import bipartite

    rng = np.random.default_rng(0)
    metric32 = rng.standard_normal((3, 64, 16)).astype(np.float32)
    # bf16-representable values so fp32 and bf16 paths see the same bits
    metric_bf = jnp.asarray(metric32, jnp.bfloat16)
    metric32 = np.asarray(metric_bf, np.float32)
    m32 = bipartite.bipartite_soft_matching(jnp.asarray(metric32), 10)
    mbf = bipartite.bipartite_soft_matching(metric_bf, 10)
    np.testing.assert_array_equal(np.asarray(m32.src_idx), np.asarray(mbf.src_idx))
    np.testing.assert_array_equal(np.asarray(m32.dst_idx), np.asarray(mbf.dst_idx))
    np.testing.assert_array_equal(np.asarray(m32.unm_idx), np.asarray(mbf.unm_idx))
