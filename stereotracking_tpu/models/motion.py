"""Registered motion models beyond the Kalman filter.

The reference registers three extra motion modules
(/root/reference/mmtrack/models/motion/__init__.py): ``LinearMotion``
(linear_motion.py), ``CameraMotionCompensation`` (ECC,
camera_motion_compensation.py) and ``FlowNetSimple``.  The first two live here; FlowNetSimple is
implemented with the VID family (models/vid/flownet.py) and re-exported
below:

* ``LinearMotion`` as pure fixed-shape JAX over (T, 4) observation
  histories — vmap-able across track slots and usable inside ``lax.scan``;
* ``CameraMotionCompensation`` computing the ECC Euclidean warp host-side
  with OpenCV exactly like the reference (cv2.findTransformECC), with the
  warp application to boxes in JAX.  The fully on-device CMC alternative
  (block-matching flow + RANSAC affine) lives in ``ops/gmc.py``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# LinearMotion (linear_motion.py:20-76 semantics)
# ---------------------------------------------------------------------------

def _centers(bboxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([(bboxes[..., 0] + bboxes[..., 2]) / 2,
                      (bboxes[..., 1] + bboxes[..., 3]) / 2], axis=-1)


def linear_velocity(bboxes: jnp.ndarray, num_valid: jnp.ndarray,
                    num_samples: int = 2,
                    center_motion: bool = False) -> jnp.ndarray:
    """Mean step-to-step velocity over the last ``min(num_valid,
    num_samples)`` boxes of a (T, 4) history (most recent last).

    Matches LinearMotion.get_velocity: with n samples the velocity is the
    mean of the n-1 consecutive diffs; n is clamped to the number of valid
    trailing boxes.  Returns (2,) center velocity or (4,) box velocity.
    """
    T = bboxes.shape[0]
    pts = _centers(bboxes) if center_motion else bboxes
    diffs = pts[1:] - pts[:-1]                       # (T-1, D)
    n = jnp.clip(jnp.minimum(num_valid, num_samples), 2, T)
    # diffs used: indices T-1-(n-1) .. T-2  (the last n-1 diffs)
    idx = jnp.arange(T - 1)
    use = idx >= (T - n)
    denom = jnp.maximum(n - 1, 1)
    return (diffs * use[:, None]).sum(0) / denom


def linear_step(bbox: jnp.ndarray, velocity: jnp.ndarray,
                center_motion: bool = False) -> jnp.ndarray:
    """Advance one box by the velocity (LinearMotion.step)."""
    if center_motion:
        c = _centers(bbox[None])[0] + velocity
        w = bbox[2] - bbox[0]
        h = bbox[3] - bbox[1]
        return jnp.stack([c[0] - w / 2, c[1] - h / 2,
                          c[0] + w / 2, c[1] + h / 2])
    return bbox + velocity


class LinearMotion:
    """Config-compatible wrapper (type='LinearMotion')."""

    def __init__(self, num_samples: int = 2, center_motion: bool = False):
        self.num_samples = num_samples
        self.center_motion = center_motion

    def get_velocity(self, bboxes: jnp.ndarray,
                     num_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if num_valid is None:
            num_valid = jnp.asarray(bboxes.shape[0])
        return linear_velocity(jnp.asarray(bboxes), num_valid,
                               self.num_samples, self.center_motion)

    def step(self, bboxes: jnp.ndarray,
             velocity: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        bboxes = jnp.asarray(bboxes)
        if velocity is None:
            velocity = self.get_velocity(bboxes)
        return linear_step(bboxes[-1], velocity, self.center_motion)


# ---------------------------------------------------------------------------
# ECC camera-motion compensation (camera_motion_compensation.py semantics)
# ---------------------------------------------------------------------------

def warp_bboxes(bboxes: jnp.ndarray, warp: jnp.ndarray) -> jnp.ndarray:
    """Apply a 2x3 affine warp to xyxy boxes by warping the two corners
    (CameraMotionCompensation.warp_bboxes)."""
    tl = jnp.concatenate([bboxes[:, :2], jnp.ones((bboxes.shape[0], 1))], 1)
    br = jnp.concatenate([bboxes[:, 2:], jnp.ones((bboxes.shape[0], 1))], 1)
    return jnp.concatenate([tl @ warp.T, br @ warp.T], axis=1)


class CameraMotionCompensation:
    """ECC Euclidean image alignment (config type='CameraMotionCompensation').

    The warp estimate runs host-side through OpenCV's findTransformECC with
    the reference's defaults (MOTION_EUCLIDEAN, 50 iters, eps 1e-3); the
    application to boxes/Kalman states is JAX (``warp_bboxes``,
    ``ops.gmc.apply_affine_to_tracks``).
    """

    def __init__(self, warp_mode: str = 'cv2.MOTION_EUCLIDEAN',
                 num_iters: int = 50, stop_eps: float = 0.001):
        self.warp_mode_name = warp_mode.split('.')[-1]
        self.num_iters = num_iters
        self.stop_eps = stop_eps

    def get_warp_matrix(self, img: np.ndarray,
                        ref_img: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8/float RGB frames -> 2x3 warp matrix."""
        import cv2
        mode = getattr(cv2, self.warp_mode_name)
        img = cv2.cvtColor(np.asarray(img, np.uint8), cv2.COLOR_RGB2GRAY)
        ref = cv2.cvtColor(np.asarray(ref_img, np.uint8), cv2.COLOR_RGB2GRAY)
        warp = np.eye(2, 3, dtype=np.float32)
        criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                    self.num_iters, self.stop_eps)
        _, warp = cv2.findTransformECC(img, ref, warp, mode, criteria, None,
                                       1)
        return warp

    def compensate(self, img: np.ndarray, ref_img: np.ndarray,
                   bboxes: jnp.ndarray) -> Tuple[jnp.ndarray, np.ndarray]:
        """Estimate the warp and apply it to the boxes; returns
        (warped_bboxes, warp_matrix)."""
        warp = self.get_warp_matrix(img, ref_img)
        return warp_bboxes(jnp.asarray(bboxes), jnp.asarray(warp)), warp


# ---------------------------------------------------------------------------
# FlowNetSimple re-export: the reference registers it as a motion model
# (motion/__init__.py) though only the VID family consumes it.
# ---------------------------------------------------------------------------
from .vid.flownet import FlowNetSimple, flow_warp_feats  # noqa: E402,F401
