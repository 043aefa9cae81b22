"""RoIAlign as a fixed-shape vectorized bilinear gather (TPU-native).

Replaces the mmcv CUDA RoIAlign kernel the reference's two-stage heads
depend on (SURVEY.md section 2.9: RoIAlign/PrRoIPool used by the SELSA
roi_heads, MaskTrackRCNN and the IoUNet head). Semantics follow mmcv
``RoIAlign(aligned=True)``: continuous roi coordinates scaled by
``spatial_scale`` with a -0.5 alignment offset, each output bin averaged
over a ``sampling_ratio x sampling_ratio`` bilinear sample grid.

TPU notes: the sample count is static — mmcv's ``sampling_ratio=0``
(adaptive ceil(bin_size)) is data-dependent and would force dynamic
shapes, so a fixed ratio (default 2, the common detectron2 setting) is
used; out-of-bound samples clamp to the feature border exactly like the
CUDA kernel. Everything is one gather + reshape-mean, batchable over any
number of rois.
"""
from __future__ import annotations

import jax.numpy as jnp


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, out_size: int,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """``feat`` (H, W, C); ``rois`` (R, 4) xyxy in input-image coords.
    Returns (R, out_size, out_size, C)."""
    h, w, c = feat.shape
    r = rois.shape[0]
    offset = 0.5 if aligned else 0.0
    boxes = rois * spatial_scale - offset          # (R, 4)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    if not aligned:
        # legacy behavior: force rois to be at least 1x1
        x2 = jnp.maximum(x2, x1 + 1.0)
        y2 = jnp.maximum(y2, y1 + 1.0)
    bin_w = (x2 - x1) / out_size
    bin_h = (y2 - y1) / out_size

    s = sampling_ratio
    # sample position p of bin b along an axis: lo + (b + (p+.5)/s) * bin
    grid = (jnp.arange(out_size)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)  # (out*s,)
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]          # (R, out*s)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]

    # bilinear sample with border clamp (mmcv: y<=-1 or y>=H are zero,
    # values in [-1, 0] clamp to 0 — replicate including the zero band)
    def interp_weights(pos, size):
        valid = (pos > -1.0) & (pos < size)
        p = jnp.clip(pos, 0.0, size - 1.0)
        i0 = jnp.floor(p).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size - 1)
        f = p - i0
        return i0, i1, f, valid.astype(feat.dtype)

    yi0, yi1, fy, vy = interp_weights(ys, h)
    xi0, xi1, fx, vx = interp_weights(xs, w)

    flat = feat.reshape(h * w, c)

    def take(yi, xi):
        idx = yi[:, :, None] * w + xi[:, None, :]      # (R, S, S)
        return flat[idx.reshape(-1)].reshape(r, ys.shape[1], xs.shape[1], c)

    v00 = take(yi0, xi0)
    v01 = take(yi0, xi1)
    v10 = take(yi1, xi0)
    v11 = take(yi1, xi1)
    fy_ = fy[:, :, None, None]
    fx_ = fx[:, None, :, None]
    val = (v00 * (1 - fy_) * (1 - fx_) + v01 * (1 - fy_) * fx_
           + v10 * fy_ * (1 - fx_) + v11 * fy_ * fx_)
    val = val * (vy[:, :, None] * vx[:, None, :])[..., None]

    # average the s x s samples of each bin
    val = val.reshape(r, out_size, s, out_size, s, c)
    return val.mean(axis=(2, 4))
