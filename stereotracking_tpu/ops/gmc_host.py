"""Exact host-side camera-motion chain via OpenCV.

This is the reference's Mesh-Affine CMAC verbatim in behavior
(/root/reference/mmtrack/models/trackers/utils.py:6-55): resize both frames
to 255x255, histogram-equalized grayscale, Farneback dense flow
(pyr_scale 0.5 / 5 levels / 3 iterations / poly 5 / sigma 1.2), per-16px
mesh-cell median flow, then a RANSAC 4-DoF ``estimateAffinePartial2D`` on
the cell centers in original-image pixels.  It exists alongside the
on-device ``ops.gmc`` chain for when bit-level parity with the reference
matters more than keeping the frame on device (mirroring how
``models.motion.CameraMotionCompensation`` uses cv2 ECC); the two are A/B'd
on synthetic camera motion in tests/test_gmc_ab.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def glme_affine_host(prev_bgr: np.ndarray, curr_bgr: np.ndarray,
                     step: int = 16, winsize: int = 31,
                     ransac_thr: float = 5.0,
                     min_inlier_ratio: float = 0.3
                     ) -> Tuple[Optional[np.ndarray], float]:
    """(H, W, 3) uint8 BGR frames -> (2x3 affine in original pixels | None,
    inlier ratio).  ``None`` when RANSAC fails or the inlier ratio is below
    ``min_inlier_ratio`` (callers then skip the warp)."""
    import cv2

    ori_h, ori_w = curr_bgr.shape[:2]
    side = 255
    fx, fy = ori_w / side, ori_h / side

    grays = []
    for frame in (prev_bgr, curr_bgr):
        small = cv2.resize(np.ascontiguousarray(frame[..., :3]),
                           (side, side))
        grays.append(cv2.equalizeHist(
            cv2.cvtColor(small, cv2.COLOR_BGR2GRAY)))
    prev_gray, curr_gray = grays

    flow = cv2.calcOpticalFlowFarneback(
        prev_gray, curr_gray, None, pyr_scale=0.5, levels=5,
        winsize=winsize, iterations=3, poly_n=5, poly_sigma=1.2, flags=0)
    flow = flow * np.array([fx, fy], np.float32)

    grid = side // step
    crop = flow[:grid * step, :grid * step]
    mesh = np.median(crop.reshape(grid, step, grid, step, 2),
                     axis=(1, 3)).reshape(-1, 2)

    ys, xs = np.mgrid[0:grid, 0:grid]
    centers = np.stack([(xs + 0.5) * step * fx,
                        (ys + 0.5) * step * fy],
                       axis=-1).reshape(-1, 2).astype(np.float32)
    moved = (centers + mesh).astype(np.float32)

    warp, inliers = cv2.estimateAffinePartial2D(
        centers, moved, method=cv2.RANSAC,
        ransacReprojThreshold=ransac_thr)
    if warp is None or inliers is None:
        return None, 0.0
    ratio = float(inliers.sum()) / len(centers)
    if ratio < min_inlier_ratio:
        return None, ratio
    return warp.astype(np.float32), ratio
