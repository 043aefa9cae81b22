"""Small image utilities (reference mmtrack/utils/image.py capability)."""
from __future__ import annotations

import numpy as np


def crop_image(img: np.ndarray, bbox, pad_value: float = 0.0) -> np.ndarray:
    """Crop xyxy bbox from an image, zero-padding out-of-bounds regions."""
    x1, y1, x2, y2 = [int(v) for v in bbox]
    h, w = img.shape[:2]
    out = np.full((y2 - y1, x2 - x1) + img.shape[2:], pad_value,
                  img.dtype)
    sx1, sy1 = max(x1, 0), max(y1, 0)
    sx2, sy2 = min(x2, w), min(y2, h)
    if sx2 > sx1 and sy2 > sy1:
        out[sy1 - y1:sy2 - y1, sx1 - x1:sx2 - x1] = img[sy1:sy2, sx1:sx2]
    return out


def imrenormalize(img: np.ndarray, old_mean, old_std, new_mean,
                  new_std) -> np.ndarray:
    """Undo one normalization and apply another."""
    old_mean = np.asarray(old_mean, np.float32)
    old_std = np.asarray(old_std, np.float32)
    new_mean = np.asarray(new_mean, np.float32)
    new_std = np.asarray(new_std, np.float32)
    return (img * old_std + old_mean - new_mean) / new_std


def gauss_blur(img: np.ndarray, sigma: float = 1.0,
               radius: int = 2) -> np.ndarray:
    """Separable Gaussian blur (PIL-free, numpy convolution)."""
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-x * x / (2 * sigma * sigma))
    k /= k.sum()
    out = img.astype(np.float32)
    out = np.apply_along_axis(lambda m: np.convolve(m, k, 'same'), 0, out)
    out = np.apply_along_axis(lambda m: np.convolve(m, k, 'same'), 1, out)
    return out.astype(img.dtype)
