"""Fused attention kernel vs the einsum reference (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtm.ops.flash_attention import _reference, tome_flash_attention


@pytest.mark.parametrize("n", [300, 256, 1000])
@pytest.mark.parametrize("with_bias", [False, True])
def test_kernel_matches_reference(n, with_bias):
    b, h, d = 2, 3, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = (
        jnp.asarray(np.log(rng.uniform(1, 5, (b, n))), jnp.float32)
        if with_bias
        else None
    )
    ref = np.asarray(_reference(q, k, v, bias, 0.125))
    got = np.asarray(tome_flash_attention(q, k, v, bias, 0.125))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fwd_pick_table():
    """Long-row (n8, blk) selection: headline shapes keep their proven
    blocks; ViViT's N=3137 pads past base (3144 = 8*3*131 admits only
    blk=1048, which fails to compile at batch 8) to 3160 -> blk=632."""
    from vtm.ops.flash_attention import _fwd_pick

    assert _fwd_pick(1568, 1056) == (1568, 784)
    assert _fwd_pick(1418, 1056) == (1424, 712)
    assert _fwd_pick(3137, 1056) == (3160, 632)
    # previously no in-window divisor at base 1160 -> lanepad fallback;
    # the search now finds 1168 -> 584
    assert _fwd_pick(1160, 1056) == (1168, 584)


@pytest.mark.parametrize("with_bias", [False, True])
def test_long_row_padded_pick_matches_reference(with_bias):
    """Forward parity through the _fwd_pick padded-n8 search branch
    (n=1160 -> n8=1168, blk=584: 8 pad keys masked in the last chunk)."""
    b, h, d, n = 1, 1, 64, 1160
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = (
        jnp.asarray(np.log(rng.uniform(1, 5, (b, n))), jnp.float32)
        if with_bias
        else None
    )
    ref = np.asarray(_reference(q, k, v, bias, 0.125))
    got = np.asarray(tome_flash_attention(q, k, v, bias, 0.125))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "n,with_bias",
    [
        (256, False),  # n8 path, zero padding, whole-row block
        (300, True),   # n8 path, 4 pad keys masked by -1e30 bias entries
        (300, False),  # same padding on the unbiased path
        (520, True),   # _bwd_pick search past base: n8=528, blk=264
        (712, False),  # search past base, unbiased: n8=720, blk=240
    ],
)
def test_kernel_gradients_match_reference(n, with_bias):
    """Fused backward kernel (dq/dk/dv/dbias, q-block accumulation) vs
    the einsum reference vjp — including non-multiple-of-128 N (padded
    queries/keys must contribute zero grad)."""
    b, h, d = 1, 2, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = (
        jnp.asarray(np.log(rng.uniform(1, 5, (b, n))), jnp.float32)
        if with_bias
        else None
    )
    cot = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)

    def loss(fn):
        def inner(q_, k_, v_, b_):
            return (fn(q_, k_, v_, b_, 0.125) * cot).sum()

        return inner

    got = jax.grad(loss(tome_flash_attention), argnums=(0, 1, 2) + ((3,) if with_bias else ()))(
        q, k, v, bias
    )
    ref = jax.grad(loss(_reference), argnums=(0, 1, 2) + ((3,) if with_bias else ()))(
        q, k, v, bias
    )
    names = ["dq", "dk", "dv", "dbias"]
    for name, a, b_ in zip(names, got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_attention_core_dispatch_consistency():
    """attention_core einsum path == kernel path on the same inputs
    (CPU: kernel runs interpreted)."""
    from vtm.models.common import attention_core
    from vtm.ops.flash_attention import tome_flash_attention

    b, h, n, d = 1, 2, 300, 64
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    size = jnp.asarray(rng.uniform(1, 4, (b, n, 1)), jnp.float32)
    bias = jnp.log(size[:, :, 0])[:, None, None, :]

    out_einsum = attention_core(q, k, v, 0.125, bias)
    out_kernel = tome_flash_attention(q, k, v, bias[:, 0, 0, :], 0.125)
    np.testing.assert_allclose(
        np.asarray(out_einsum), np.asarray(out_kernel), rtol=2e-5, atol=2e-5
    )


def _excluded_bias_scatter_oracle(q, k, v, scale, size_bias):
    """The reference formulation: logits[:, :, 1:, 1:] += log s."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    logits = logits.at[:, :, 1:, 1:].add(size_bias[:, 0, 0][:, None, None, :])
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def test_attention_core_excluded_bias_kernel_split(monkeypatch):
    """The TimeSformer CLS-excluded bias decomposition (kernel with
    [0, log s] key bias + separate unbiased CLS row) must match the
    scatter oracle (logits[:, :, 1:, 1:] += log s)."""
    import vtm.models.common as common

    b, h, n, d = 2, 3, 197, 64
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    size = jnp.asarray(rng.uniform(1, 4, (b, n - 1, 1)), jnp.float32)
    size_bias = jnp.log(size[:, :, 0])[:, None, None, :]

    ref = _excluded_bias_scatter_oracle(q, k, v, 0.125, size_bias)
    monkeypatch.setattr(common, "_on_tpu", lambda: True)  # kernel path, interpreted
    monkeypatch.setattr(common, "_FLASH_MIN_SEQ_BIASED", 160)
    got = common.attention_core(q, k, v, 0.125, size_bias, bias_excludes_first=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_attention_core_excluded_bias_fused_einsum():
    """The fused rank-1 masked-bias einsum (row_mask ⊗ [0, log s]) must
    match the scatter oracle exactly — this is the path every merged
    TimeSformer layer takes (N <= 197 is below the kernel threshold)."""
    import vtm.models.common as common

    b, h, n, d = 2, 3, 197, 64
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    size = jnp.asarray(rng.uniform(1, 4, (b, n - 1, 1)), jnp.float32)
    size_bias = jnp.log(size[:, :, 0])[:, None, None, :]

    ref = _excluded_bias_scatter_oracle(q, k, v, 0.125, size_bias)
    got = common.attention_core(q, k, v, 0.125, size_bias, bias_excludes_first=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "f,s,h",
    [
        (8, 5, 3),    # nq8=40 < 128: padded-block fallback (odd h: per-head grid)
        (4, 50, 3),   # nq8=200: exact-divisor block (blk_q_eff=200, no q pad)
        (8, 193, 3),  # nq8=1544=8*193: no aligned divisor -> padded fallback
        (8, 5, 4),    # even h: token-major head-pair grid
        (4, 50, 2),
        (8, 193, 4),
        (5, 8, 4),    # odd frame count: fcs=1 frame chunks
    ],
)
@pytest.mark.parametrize("with_bias", [False, True])
def test_frame_kernel_matches_reference(with_bias, f, s, h):
    from vtm.ops.flash_attention import _frame_reference, tome_frame_attention

    b, d = 2, 16
    n = f * s
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = (
        jnp.asarray(np.log(rng.uniform(1, 4, (b, n))), jnp.float32)
        if with_bias
        else None
    )
    ref = np.asarray(_frame_reference(q, k, v, bias, 0.25, f))
    got = np.asarray(tome_frame_attention(q, k, v, bias, 0.25, f))
    assert got.shape == (b, n, f, h, d)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("group", [2, 4, 6, 12])
def test_frame_tm_kernel_head_group_sizes(group, monkeypatch):
    """The token-major kernel's head-group size (VTM_FRAME_TM_GROUP,
    the output-DMA-width / logits-VMEM tradeoff) must not change
    results for any Mosaic-valid divisor of h (g*d % 128 == 0 at
    d=64, or g == h)."""
    from vtm.ops.flash_attention import _frame_forward_tm, _frame_reference

    monkeypatch.setenv("VTM_FRAME_TM_GROUP", str(group))
    b, h, f, s, d = 1, 12, 4, 50, 64
    n = f * s
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = jnp.asarray(np.log(rng.uniform(1, 4, (b, n))), jnp.float32)
    ref = np.asarray(_frame_reference(q, k, v, bias, 0.25, f))
    got = np.asarray(_frame_forward_tm(q, k, v, bias, 0.25, f, 784))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variant", ["1", "0"])
@pytest.mark.parametrize(
    "f,s,h,with_bias",
    [
        (4, 50, 2, True),    # s_pad=56 (ceil8) vs 128 (ceil128)
        (8, 193, 4, True),   # padded q fallback, s_pad=200
        (8, 196, 12, False), # the Motionformer production shape (s=14*14)
        (5, 8, 4, True),     # odd frame count: fcs=1
    ],
)
def test_frame_tm_s8_matches_reference(f, s, h, with_bias, variant, monkeypatch):
    """Both token-major layouts must match the dense reference: the
    default transposed s8 scheme (frame axis on SUBLANES, s pads to
    ceil8 instead of ceil128, p normalised pre-PV) and the lane-major
    fallback kept for A/B (VTM_FRAME_S8=0)."""
    from vtm.ops.flash_attention import _frame_forward_tm, _frame_reference

    monkeypatch.setenv("VTM_FRAME_S8", variant)
    b, d = 1, 64
    n = f * s
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = (
        jnp.asarray(np.log(rng.uniform(1, 4, (b, n))), jnp.float32)
        if with_bias
        else None
    )
    ref = np.asarray(_frame_reference(q, k, v, bias, 0.25, f))
    got = np.asarray(_frame_forward_tm(q, k, v, bias, 0.25, f, 784))
    assert got.shape == (b, n, f, h, d)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_frame_tm_kernel_invalid_overrides_raise(monkeypatch):
    """Explicit A/B knobs that Mosaic would reject (or that don't
    divide h / f) must raise, not silently fall back — a silently
    ignored override corrupts the A/B it exists for."""
    from vtm.ops.flash_attention import _frame_forward_tm, _frame_tm_group

    b, h, f, s, d = 1, 12, 4, 50, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, h, f * s, d)), jnp.float32)

    monkeypatch.setenv("VTM_FRAME_TM_GROUP", "3")  # 3*64 not ÷128, != h
    with pytest.raises(ValueError, match="VTM_FRAME_TM_GROUP"):
        _frame_forward_tm(q, q, q, None, 0.25, f, 784)
    monkeypatch.setenv("VTM_FRAME_TM_GROUP", "5")  # does not divide h
    with pytest.raises(ValueError, match="divide h"):
        _frame_forward_tm(q, q, q, None, 0.25, f, 784)
    monkeypatch.delenv("VTM_FRAME_TM_GROUP")
    monkeypatch.setenv("VTM_FRAME_TM_FCS", "3")  # does not divide f=4
    with pytest.raises(ValueError, match="VTM_FRAME_TM_FCS"):
        _frame_forward_tm(q, q, q, None, 0.25, f, 784)

    # no-override fallback for small d picks a Mosaic-valid group
    monkeypatch.delenv("VTM_FRAME_TM_FCS")
    assert _frame_tm_group(12, 64) == 2
    assert _frame_tm_group(4, 16) == 4   # g*d==h*d equality case
    assert _frame_tm_group(12, 32) == 4  # 4*32 == 128


@pytest.mark.parametrize("variant", ["1", "0"])
@pytest.mark.parametrize(
    "f,s,h,with_bias",
    [
        (8, 40, 4, True),    # even h: fused head-pair bwd kernel
        (8, 40, 4, False),
        (4, 50, 2, True),    # exact-divisor q block
        (5, 8, 4, True),     # odd frame count
        (8, 40, 3, True),    # odd h: dense-recompute fallback
        (8, 300, 4, True),   # f*s_pad > 2048: fallback on long rows
    ],
)
def test_frame_kernel_gradients_match_reference(f, s, h, with_bias, variant, monkeypatch):
    monkeypatch.setenv("VTM_FRAME_S8", variant)
    """Fused per-frame backward (head-pair grid, q-block accumulation,
    per-frame softmax recompute) vs the dense reference vjp — padded
    queries/keys must contribute zero grad and the key_bias cotangent
    must fold the per-frame pad columns away."""
    from vtm.ops.flash_attention import _frame_reference, tome_frame_attention

    b, d = 2, 16
    n = f * s
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = (
        jnp.asarray(np.log(rng.uniform(1, 5, (b, n))), jnp.float32)
        if with_bias
        else None
    )
    cot = jnp.asarray(rng.standard_normal((b, n, f, h, d)), jnp.float32)

    def loss(fn):
        def inner(q_, k_, v_, b_):
            return (fn(q_, k_, v_, b_, 0.25, f) * cot).sum()

        return inner

    argnums = (0, 1, 2) + ((3,) if with_bias else ())
    got = jax.grad(loss(tome_frame_attention), argnums=argnums)(q, k, v, bias)
    ref = jax.grad(
        loss(lambda q_, k_, v_, b_, s_, f_: _frame_reference(q_, k_, v_, b_, s_, f_)),
        argnums=argnums,
    )(q, k, v, bias)
    for name, a, b_ in zip(["dq", "dk", "dv", "dbias"], got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4, err_msg=name
        )


@pytest.mark.parametrize(
    "f,s,h,with_bias,excl",
    [
        (8, 197, 4, True, True),    # TimeSformer shape: CLS-excluded bias
        (8, 197, 4, False, False),  # unbiased (baseline path)
        (4, 50, 3, True, True),     # odd heads: g == h fallback
        (5, 8, 4, True, False),     # odd frames: fcs=1; plain (all-rows) bias
        (8, 193, 2, True, True),    # non-lane-aligned s
    ],
)
def test_blockdiag_kernel_matches_reference(f, s, h, with_bias, excl):
    """Block-diagonal per-frame attention (TimeSformer divided spatial
    attention): frame fi's queries attend only to frame fi's keys; the
    CLS-excluded size bias applies to rows > 0 of each frame."""
    from vtm.ops.flash_attention import _blockdiag_reference, tome_blockdiag_attention

    b, d = 2, 16
    n = f * s
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = (
        jnp.asarray(np.log(rng.uniform(1, 4, (b, n))), jnp.float32)
        if with_bias
        else None
    )
    ref = np.asarray(_blockdiag_reference(q, k, v, bias, 0.25, f, excl))
    got = np.asarray(tome_blockdiag_attention(q, k, v, bias, 0.25, f, excl))
    assert got.shape == (b, n, h * d)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_blockdiag_odd_heads_lane_aligned_d():
    """Regression: h=3 with d=64 ((2*d) % 128 == 0 but h % 2 != 0) must
    not take the head-pair fast path — grid h//2 == 1 would silently
    skip the last head and leave its output columns unwritten."""
    from vtm.ops.flash_attention import _blockdiag_reference, tome_blockdiag_attention

    b, f, h, s, d = 1, 2, 3, 33, 64
    n = f * s
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    ref = np.asarray(_blockdiag_reference(q, k, v, None, 0.125, f))
    got = np.asarray(tome_blockdiag_attention(q, k, v, None, 0.125, f))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_blockdiag_matches_folded_attention_core():
    """The kernel on the unfolded [B, f*s] frame-major layout must equal
    attention_core on the folded (b t) batch — the two formulations the
    TimeSformer block dispatches between."""
    from vtm.models.common import attention_core
    from vtm.ops.flash_attention import tome_blockdiag_attention

    b, f, h, s, d = 2, 4, 3, 33, 16
    n = f * s
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    sizes = rng.uniform(1, 4, (b, f, s))
    sizes[:, :, 0] = 1.0  # CLS
    kb = jnp.asarray(np.log(sizes), jnp.float32).reshape(b, n)

    got = np.asarray(
        tome_blockdiag_attention(q, k, v, kb, 0.25, f, True)
    ).reshape(b, f, s, h * d)

    fold = lambda z: z.reshape(b, h, f, s, d).transpose(0, 2, 1, 3, 4).reshape(b * f, h, s, d)  # noqa: E731
    sb = jnp.asarray(np.log(sizes[:, :, 1:]), jnp.float32).reshape(b * f, 1, 1, s - 1)
    ref = attention_core(fold(q), fold(k), fold(v), 0.25, sb, bias_excludes_first=True)
    ref = np.asarray(jnp.transpose(ref, (0, 2, 1, 3)).reshape(b, f, s, h * d))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "f,s,h,with_bias,excl",
    [
        (8, 40, 4, True, True),
        (4, 50, 3, True, False),  # odd heads
        (8, 40, 4, False, False),
        (5, 8, 4, True, True),    # odd frames
    ],
)
def test_blockdiag_gradients_match_reference(f, s, h, with_bias, excl):
    """Fused block-diagonal backward (pure local writes — every
    (head, frame) pair lives in exactly one program) vs the dense
    reference vjp, including the row-masked bias cotangent."""
    from vtm.ops.flash_attention import _blockdiag_reference, tome_blockdiag_attention

    b, d = 2, 16
    n = f * s
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = (
        jnp.asarray(np.log(rng.uniform(1, 5, (b, n))), jnp.float32)
        if with_bias
        else None
    )
    cot = jnp.asarray(rng.standard_normal((b, n, h * d)), jnp.float32)

    def loss(fn):
        def inner(q_, k_, v_, b_):
            return (fn(q_, k_, v_, b_, 0.25, f, excl) * cot).sum()

        return inner

    argnums = (0, 1, 2) + ((3,) if with_bias else ())
    got = jax.grad(loss(tome_blockdiag_attention), argnums=argnums)(q, k, v, bias)
    ref = jax.grad(
        loss(
            lambda q_, k_, v_, b_, s_, f_, e_: _blockdiag_reference(
                q_, k_, v_, b_, s_, f_, e_
            )
        ),
        argnums=argnums,
    )(q, k, v, bias)
    for name, a, b_ in zip(["dq", "dk", "dv", "dbias"], got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4, err_msg=name
        )


@pytest.mark.parametrize(
    "f,s,blk_q",
    [
        (8, 196, 784),   # Motionformer ViT-B/224 production shape
        (8, 256, 784),   # s at the pad boundary
        (16, 196, 784),  # 16-frame variant
        (8, 49, 784),    # small spatial grid
    ],
)
def test_frame_tm_kernel_vmem_footprint_bounded(f, s, blk_q):
    """Regression tripwire for the scoped-VMEM OOM: the token-major
    kernel once held full-f K/V blocks + two whole-row fp32 logits
    tiles per program, which blew Mosaic's 16 MB scoped-VMEM stack
    inside the merged Motionformer program (22.9 MB at B8 H12 N1568
    f8). Recompute the per-program block footprint from the same
    parameter choices the kernel makes and assert it stays well under
    the limit (<= 8 MB, leaving headroom for XLA's overlapped copies
    that share the stack in-model)."""
    from vtm.ops.flash_attention import _LANE, _frame_blk_q

    d = 64
    n = f * s
    fcs = 2 if f % 2 == 0 else 1
    s_pad = -(-s // _LANE) * _LANE
    c_pad = s_pad * fcs
    blk_q_eff = _frame_blk_q(n, 2 * c_pad, blk_q)

    # per-program VMEM blocks, double-buffered (x2) for grid pipelining
    q_blk = 2 * blk_q_eff * d * 2          # [1, 2, blk_q, d] bf16
    kv_blk = 2 * (2 * c_pad * d * 2)       # K and V [1, 2, c_pad, d] bf16
    bias_blk = c_pad * 4                   # [1, 1, c_pad] fp32
    out_blk = blk_q_eff * fcs * 2 * d * 2  # [1, blk_q, 1, fcs, 2d] bf16
    logits = 2 * blk_q_eff * c_pad * 4     # two fp32 scratch tiles
    total = 2 * (q_blk + kv_blk + bias_blk + out_blk) + logits
    assert total <= 8 * 1024 * 1024, (
        f"f={f} s={s}: per-program VMEM {total / 1e6:.1f} MB "
        f"(blk_q_eff={blk_q_eff}, c_pad={c_pad})"
    )
