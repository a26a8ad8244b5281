"""RandAugment + RandomErasing (reference rand_augment.py/random_erasing.py)."""

import numpy as np

from vtm.data.rand_augment import RandomErasing, create_random_augment, parse_policy


def test_parse_policy():
    assert parse_policy("rand-m7-n4-mstd0.5-inc1") == (7.0, 4, 0.5, True)
    assert parse_policy("rand-m20-n2-mstd0.5-inc1") == (20.0, 2, 0.5, True)
    assert parse_policy("rand-m9-mstd0.5") == (9.0, 2, 0.5, False)


def test_random_augment_shape_and_consistency():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    aug = create_random_augment("rand-m7-n4-mstd0.5-inc1", seed=3)
    out = aug(frames)
    assert out.shape == frames.shape and out.dtype == np.uint8
    # same seed -> same result (temporally consistent policy per clip)
    out2 = create_random_augment("rand-m7-n4-mstd0.5-inc1", seed=3)(frames)
    np.testing.assert_array_equal(out, out2)


def test_random_erasing_erases_region():
    frames = np.zeros((4, 32, 32, 3), np.float32)
    er = RandomErasing(probability=1.0, mode="pixel", seed=0)
    out = er(frames)
    changed = np.abs(out).sum(axis=(0, 3)) > 0
    assert changed.any() and not changed.all()
    # the same region is erased in every frame
    per_frame = (np.abs(out).sum(axis=3) > 0)
    for t in range(1, 4):
        np.testing.assert_array_equal(per_frame[0], per_frame[t])


def test_random_erasing_prob_zero_noop():
    frames = np.zeros((2, 16, 16, 3), np.float32)
    out = RandomErasing(probability=0.0, seed=0)(frames)
    np.testing.assert_array_equal(out, frames)
