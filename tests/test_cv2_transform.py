"""Full-surface parity for vtm/data/cv2_transform.py vs the reference
slowfast/datasets/cv2_transform.py (pure numpy/cv2 — both sides run
with the same np.random seed; the module matches the reference's
random-draw order exactly)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref_cv2():
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from conftest import load_reference_module

    return load_reference_module(
        "slowfast/datasets/cv2_transform.py", "ref_cv2_transform"
    )


def _imgs(n=3, h=48, w=64, seed=0, chw=False):
    rng = np.random.default_rng(seed)
    shape = (3, h, w) if chw else (h, w, 3)
    return [rng.uniform(0, 255, shape).astype(np.float32) for _ in range(n)]


def _boxes(seed=1, n=2, h=48, w=64):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, w / 2, n)
    y1 = rng.uniform(0, h / 2, n)
    return np.stack(
        [x1, y1, x1 + rng.uniform(1, w / 2, n), y1 + rng.uniform(1, h / 2, n)],
        axis=1,
    ).astype(np.float32)


def _both(fn_name, ref_cv2, args_factory, seed=7):
    """Run reference and vtm versions with identical np.random state."""
    import vtm.data.cv2_transform as mine

    np.random.seed(seed)
    want = getattr(ref_cv2, fn_name)(*args_factory())
    np.random.seed(seed)
    got = getattr(mine, fn_name)(*args_factory())
    return want, got


def _assert_tree(want, got):
    if want is None:
        assert got is None
        return
    if isinstance(want, (list, tuple)):
        assert len(want) == len(got)
        for w, g in zip(want, got):
            _assert_tree(w, g)
        return
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-4)


def test_boxes_ops(ref_cv2):
    import vtm.data.cv2_transform as mine

    b = _boxes()
    np.testing.assert_allclose(
        ref_cv2.clip_boxes_to_image(b.copy(), 48, 64),
        mine.clip_boxes_to_image(b.copy(), 48, 64),
    )
    np.testing.assert_allclose(
        ref_cv2.flip_boxes(b.copy(), 64), mine.flip_boxes(b.copy(), 64)
    )
    np.testing.assert_allclose(
        ref_cv2.crop_boxes(b.copy(), 3, 5), mine.crop_boxes(b.copy(), 3, 5)
    )
    np.testing.assert_allclose(
        ref_cv2.scale_boxes(32, b.copy(), 48, 64),
        mine.scale_boxes(32, b.copy(), 48, 64),
    )
    np.testing.assert_allclose(
        ref_cv2.revert_scaled_boxes(32, b.copy(), 48, 64),
        mine.revert_scaled_boxes(32, b.copy(), 48, 64),
    )


def test_scales_and_crops(ref_cv2):
    import vtm.data.cv2_transform as mine

    img = _imgs(1)[0]
    np.testing.assert_allclose(ref_cv2.scale(32, img), mine.scale(32, img))
    np.testing.assert_allclose(
        ref_cv2.center_crop(32, img), mine.center_crop(32, img)
    )
    for pos in (0, 1, 2):
        want = ref_cv2.spatial_shift_crop_list(
            32, _imgs(), pos, boxes=[_boxes()]
        )
        got = __import__("vtm.data.cv2_transform", fromlist=["x"]
                         ).spatial_shift_crop_list(32, _imgs(), pos,
                                                   boxes=[_boxes()])
        _assert_tree(want, got)

    for fn in ("random_short_side_scale_jitter_list",):
        want, got = _both(fn, ref_cv2,
                          lambda: (_imgs(), 36, 56, [_boxes()]))
        _assert_tree(want, got)
    want, got = _both("random_scale_jitter", ref_cv2, lambda: (_imgs(1)[0], 36, 56))
    _assert_tree(want, got)
    want, got = _both("random_scale_jitter_list", ref_cv2, lambda: (_imgs(), 36, 56))
    _assert_tree(want, got)
    want, got = _both(
        "random_crop_list", ref_cv2,
        lambda: (_imgs(chw=True), 32, 2, "CHW", [_boxes()]),
    )
    _assert_tree(want, got)
    want, got = _both(
        "random_crop_list", ref_cv2, lambda: (_imgs(), 32, 0, "HWC", None)
    )
    _assert_tree(want, got)
    want, got = _both(
        "random_sized_crop", ref_cv2, lambda: (_imgs(1)[0], 32, 0.3)
    )
    _assert_tree(want, got)
    want, got = _both(
        "random_sized_crop_list", ref_cv2, lambda: (_imgs(), 32, 0.3)
    )
    _assert_tree(want, got)


def test_flips_and_pad(ref_cv2):
    for order, chw in (("CHW", True), ("HWC", False)):
        want, got = _both(
            "horizontal_flip_list", ref_cv2,
            lambda: (1.0, _imgs(chw=chw), order, [_boxes()]),
        )
        _assert_tree(want, got)
        want, got = _both(
            "horizontal_flip", ref_cv2, lambda: (1.0, _imgs(chw=chw)[0], order)
        )
        _assert_tree(want, got)
        import vtm.data.cv2_transform as mine

        np.testing.assert_allclose(
            ref_cv2.pad_image(_imgs(chw=chw)[0], 3, order),
            mine.pad_image(_imgs(chw=chw)[0], 3, order),
        )


def test_layout_and_normalization(ref_cv2):
    import vtm.data.cv2_transform as mine

    img = _imgs(1, chw=True)[0]
    np.testing.assert_allclose(
        ref_cv2.CHW2HWC(img.copy()), mine.CHW2HWC(img.copy())
    )
    np.testing.assert_allclose(
        ref_cv2.HWC2CHW(_imgs(1)[0]), mine.HWC2CHW(_imgs(1)[0])
    )
    mean, std = [110.0, 105.0, 100.0], [55.0, 60.0, 65.0]
    np.testing.assert_allclose(
        ref_cv2.color_normalization(img.copy(), mean, std),
        mine.color_normalization(img.copy(), mean, std),
        atol=1e-5,
    )


def test_color_ops(ref_cv2):
    import vtm.data.cv2_transform as mine

    img = _imgs(1, chw=True)[0]
    np.testing.assert_allclose(
        ref_cv2.grayscale(img), mine.grayscale(img), atol=1e-3
    )
    np.testing.assert_allclose(
        ref_cv2.blend(img, img * 0.5, 0.3), mine.blend(img, img * 0.5, 0.3)
    )
    for fn in ("saturation", "brightness", "contrast"):
        want, got = _both(fn, ref_cv2, lambda: (0.4, _imgs(1, chw=True)[0]))
        _assert_tree(want, got)
    for fn in ("saturation_list", "brightness_list", "contrast_list"):
        want, got = _both(fn, ref_cv2, lambda: (0.4, _imgs(chw=True)))
        _assert_tree(want, got)
    want, got = _both(
        "color_jitter", ref_cv2,
        lambda: (_imgs(1, chw=True)[0], 0.4, 0.3, 0.2),
    )
    _assert_tree(want, got)
    want, got = _both(
        "color_jitter_list", ref_cv2, lambda: (_imgs(chw=True), 0.4, 0.3, 0.2)
    )
    _assert_tree(want, got)


def test_lighting(ref_cv2):
    eigval = [0.2175, 0.0188, 0.0045]
    eigvec = [
        [-0.5675, 0.7192, 0.4009],
        [-0.5808, -0.0045, -0.814],
        [-0.5836, -0.6948, 0.4203],
    ]
    want, got = _both(
        "lighting", ref_cv2,
        lambda: (_imgs(1, chw=True)[0], 0.1, eigval, eigvec),
    )
    _assert_tree(want, got)
    want, got = _both(
        "lighting_list", ref_cv2,
        lambda: (_imgs(chw=True), 0.1, eigval, eigvec),
    )
    _assert_tree(want, got)
