"""Host-side video transforms, numpy/cv2.

Ports the subset of slowfast/datasets/transform.py the ToMe eval/train
paths exercise, with identical geometry math (offsets, scale selection)
so test-mode determinism matches the reference (SURVEY.md §7.5).
Frames are numpy [T, H, W, C] uint8 or float32 throughout (TPU wants
channels-last; the reference's CHW permutes are dropped).
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np


def _resize(frames: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """Bilinear resize of [T, H, W, C] (reference uses torch bilinear,
    align_corners=False; cv2 INTER_LINEAR matches that geometry)."""
    out = np.empty((frames.shape[0], new_h, new_w, frames.shape[3]), dtype=frames.dtype)
    for i in range(frames.shape[0]):
        out[i] = cv2.resize(frames[i], (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    return out


def short_side_scale(frames: np.ndarray, size: int) -> np.ndarray:
    """Scale the short side to ``size`` (reference
    random_short_side_scale_jitter with min==max, transform.py:47-90)."""
    t, h, w, c = frames.shape
    if (w <= h and w == size) or (h <= w and h == size):
        return frames
    if w < h:
        new_w = size
        new_h = int(math.floor(float(h) / w * size))
    else:
        new_h = size
        new_w = int(math.floor(float(w) / h * size))
    return _resize(frames, new_h, new_w)


def random_short_side_scale_jitter(
    frames: np.ndarray, min_size: int, max_size: int, inverse_uniform_sampling=False
) -> np.ndarray:
    if inverse_uniform_sampling:
        size = int(round(1.0 / random.uniform(1.0 / max_size, 1.0 / min_size)))
    else:
        size = int(round(random.uniform(min_size, max_size)))
    t, h, w, c = frames.shape
    if (w <= h and w == size) or (h <= w and h == size):
        return frames
    if w < h:
        new_w = size
        new_h = int(math.floor(float(h) / w * size))
    else:
        new_h = size
        new_w = int(math.floor(float(w) / h * size))
    return _resize(frames, new_h, new_w)


def random_crop(frames: np.ndarray, size: int) -> np.ndarray:
    t, h, w, c = frames.shape
    if h == size and w == size:
        return frames
    y = 0 if h == size else int(random.randint(0, h - size))
    x = 0 if w == size else int(random.randint(0, w - size))
    return frames[:, y : y + size, x : x + size, :]


def uniform_crop(frames: np.ndarray, size: int, spatial_idx: int) -> np.ndarray:
    """Left/center/right (or top/center/bottom) crop with the reference's
    ceil-centred offsets (transform.py:194-256)."""
    assert spatial_idx in (0, 1, 2)
    t, h, w, c = frames.shape
    y_offset = int(math.ceil((h - size) / 2))
    x_offset = int(math.ceil((w - size) / 2))
    if h > w:
        if spatial_idx == 0:
            y_offset = 0
        elif spatial_idx == 2:
            y_offset = h - size
    else:
        if spatial_idx == 0:
            x_offset = 0
        elif spatial_idx == 2:
            x_offset = w - size
    return frames[:, y_offset : y_offset + size, x_offset : x_offset + size, :]


def horizontal_flip(prob: float, frames: np.ndarray) -> np.ndarray:
    if random.uniform(0, 1) < prob:
        return frames[:, :, ::-1, :]
    return frames


def tensor_normalize(
    frames: np.ndarray, mean: Sequence[float], std: Sequence[float]
) -> np.ndarray:
    """uint8 [0,255] -> normalized float32 (reference
    datasets/utils.py:283-303)."""
    frames = frames.astype(np.float32)
    if frames.max() > 1.0 + 1e-3:
        frames = frames / 255.0
    return (frames - np.asarray(mean, dtype=np.float32)) / np.asarray(std, dtype=np.float32)


def spatial_sampling(
    frames: np.ndarray,
    spatial_idx: int = -1,
    min_scale: int = 256,
    max_scale: int = 320,
    crop_size: int = 224,
    random_horizontal_flip: bool = True,
    inverse_uniform_sampling: bool = False,
) -> np.ndarray:
    """Train (spatial_idx==-1) vs deterministic test crops (reference
    datasets/utils.py:117-189)."""
    assert spatial_idx in (-1, 0, 1, 2)
    if spatial_idx == -1:
        frames = random_short_side_scale_jitter(
            frames, min_scale, max_scale, inverse_uniform_sampling
        )
        frames = random_crop(frames, crop_size)
        if random_horizontal_flip:
            frames = horizontal_flip(0.5, frames)
    else:
        assert len({min_scale, max_scale}) == 1
        frames = short_side_scale(frames, min_scale)
        frames = uniform_crop(frames, crop_size, spatial_idx)
    return frames


def train_augment(cfg, frames: np.ndarray, mode: str) -> np.ndarray:
    """RandAugment on uint8 frames before normalisation (reference
    datasets/utils.aug_frame via AUG.ENABLE)."""
    if mode != "train" or not cfg.AUG.ENABLE:
        return frames
    from vtm.data.rand_augment import create_random_augment

    return create_random_augment(cfg.AUG.AA_TYPE)(frames)


def train_random_erase(cfg, frames: np.ndarray, mode: str) -> np.ndarray:
    """RandomErasing on normalised float frames (reference AUG.RE_*)."""
    if mode != "train" or not cfg.AUG.ENABLE or cfg.AUG.RE_PROB <= 0:
        return frames
    from vtm.data.rand_augment import RandomErasing

    eraser = RandomErasing(
        probability=cfg.AUG.RE_PROB, mode=cfg.AUG.RE_MODE, max_count=cfg.AUG.RE_COUNT
    )
    return eraser(frames)
