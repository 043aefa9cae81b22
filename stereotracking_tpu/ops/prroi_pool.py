"""Exact Precise RoI Pooling (PrRoIPool) as separable analytic matmuls.

Replaces the mmcv CUDA PrRoIPool kernel used by the reference IoUNet head
(/root/reference/mmtrack/models/track_heads/iounet_head.py:111,117,123,128;
"Acquisition of Localization Confidence for Accurate Object Detection",
Jiang et al., ECCV'18). Each output bin is the *exact* integral average of
the bilinearly-interpolated feature map over the bin rectangle:

    out[b] = (1 / area_b) * integral_{bin b} f(x, y) dx dy

with f the bilinear interpolation of F (pixel (i, j) at continuous
coordinate (i, j), zero outside the map — the CUDA kernel's convention),
and rois in continuous coordinates scaled by ``spatial_scale`` with NO
half-pixel offset.

TPU-native form: the 2D integral of a bilinear surface is separable, so

    out[r, by, bx] = sum_{i,j} F[i, j] * wy[r, by, i] * wx[r, bx, j] / area_r

where ``wx[r, b, j] = H(x2 - j) - H(x1 - j)`` is the closed-form integral
of the unit hat function centered at pixel j over bin [x1, x2]
(H = antiderivative of max(0, 1 - |t|)). The whole pool is therefore two
dense contractions (MXU work), exactly differentiable in the roi
coordinates — which the IoUNet gradient-ascent refinement
(iounet_head.py:299-356) relies on.
"""
from __future__ import annotations

import jax.numpy as jnp


def _hat_antiderivative(t: jnp.ndarray) -> jnp.ndarray:
    """H(t) = integral_{-inf}^{t} max(0, 1 - |u|) du (ramps 0 -> 1 over
    [-1, 1], piecewise quadratic)."""
    tc = jnp.clip(t, -1.0, 1.0)
    return jnp.where(tc <= 0.0, 0.5 * (tc + 1.0) ** 2,
                     1.0 - 0.5 * (1.0 - tc) ** 2)


def _bin_weights(lo: jnp.ndarray, bin_size: jnp.ndarray, out_size: int,
                 n_pix: int) -> jnp.ndarray:
    """Integral of each pixel's hat over each output bin.

    ``lo``: (R,) roi start along the axis (already spatial-scaled);
    ``bin_size``: (R,). Returns (R, out_size, n_pix)."""
    b = jnp.arange(out_size, dtype=jnp.float32)
    starts = lo[:, None] + b[None, :] * bin_size[:, None]       # (R, B)
    ends = starts + bin_size[:, None]
    centers = jnp.arange(n_pix, dtype=jnp.float32)              # (P,)
    return (_hat_antiderivative(ends[:, :, None] - centers)
            - _hat_antiderivative(starts[:, :, None] - centers))


def prroi_pool(feat: jnp.ndarray, rois: jnp.ndarray, out_size: int,
               spatial_scale: float = 1.0) -> jnp.ndarray:
    """``feat`` (H, W, C); ``rois`` (R, 4) xyxy in input-image coords.
    Returns (R, out_size, out_size, C) — exact PrRoIPool semantics."""
    h, w, _ = feat.shape
    boxes = rois * spatial_scale                                # (R, 4)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bin_w = (x2 - x1) / out_size
    bin_h = (y2 - y1) / out_size

    wx = _bin_weights(x1, bin_w, out_size, w)                   # (R, B, W)
    wy = _bin_weights(y1, bin_h, out_size, h)                   # (R, B, H)

    # out[r, by, bx, c] = sum_{i,j} wy[r,by,i] feat[i,j,c] wx[r,bx,j]
    tmp = jnp.einsum('rbi,ijc->rbjc', wy, feat)
    out = jnp.einsum('rbjc,rpj->rbpc', tmp, wx)

    # CUDA kernel: win_size = max(0, bin_w * bin_h); 0-area bins output 0
    area = jnp.maximum(bin_w * bin_h, 0.0)[:, None, None, None]
    return jnp.where(area > 0.0, out / jnp.maximum(area, 1e-38), 0.0)
