"""Batched constant-velocity Kalman filter over (cx, cy, a, h) box states.

Functional re-design of the per-track numpy filter in the reference
(``/root/reference/mmtrack/models/motion/kalman_filter.py:11-259``): identical
std-weight scheme and update equations, but every operation is written over a
fixed bank of K track slots so the whole filter vmaps/jits onto the TPU VPU.
The Cholesky solve uses ``jax.scipy.linalg`` (XLA-native) instead of LAPACK.

State layout per slot: mean (8,) = [cx, cy, a, h, vcx, vcy, va, vh],
covariance (8, 8). All math in float32.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

CHI2INV95 = {
    1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877, 5: 11.070,
    6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919,
}

_STD_WEIGHT_POS = 1.0 / 20
_STD_WEIGHT_VEL = 1.0 / 160

# F: constant-velocity transition; H: position observation.
_MOTION_MAT = jnp.eye(8, dtype=jnp.float32).at[jnp.arange(4), jnp.arange(4) + 4].set(1.0)
_UPDATE_MAT = jnp.eye(4, 8, dtype=jnp.float32)


class KalmanParams(NamedTuple):
    """Static config of the filter (hyperparameters only, no state)."""
    center_only: bool = False
    use_nsa: bool = False

    @property
    def gating_threshold(self) -> float:
        return CHI2INV95[2] if self.center_only else CHI2INV95[4]


def initiate(measurement: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Create (mean, cov) from a cxcyah measurement. Batched over leading dims.

    Ref semantics: kalman_filter.py:60-85.
    """
    mean = jnp.concatenate(
        [measurement, jnp.zeros_like(measurement)], axis=-1)
    h = measurement[..., 3]
    std = jnp.stack([
        2 * _STD_WEIGHT_POS * h,
        2 * _STD_WEIGHT_POS * h,
        jnp.full_like(h, 1e-2),
        2 * _STD_WEIGHT_POS * h,
        10 * _STD_WEIGHT_VEL * h,
        10 * _STD_WEIGHT_VEL * h,
        jnp.full_like(h, 1e-5),
        10 * _STD_WEIGHT_VEL * h,
    ], axis=-1)
    cov = jnp.square(std)[..., :, None] * jnp.eye(8, dtype=measurement.dtype)
    return mean.astype(jnp.float32), cov.astype(jnp.float32)


def predict(mean: jnp.ndarray,
            cov: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One prediction step. Batched over leading dims.

    Ref semantics: kalman_filter.py:87-119.
    """
    h = mean[..., 3]
    std = jnp.stack([
        _STD_WEIGHT_POS * h, _STD_WEIGHT_POS * h,
        jnp.full_like(h, 1e-2), _STD_WEIGHT_POS * h,
        _STD_WEIGHT_VEL * h, _STD_WEIGHT_VEL * h,
        jnp.full_like(h, 1e-5), _STD_WEIGHT_VEL * h,
    ], axis=-1)
    motion_cov = jnp.square(std)[..., :, None] * jnp.eye(8, dtype=mean.dtype)
    new_mean = mean @ _MOTION_MAT.T
    new_cov = _MOTION_MAT @ cov @ _MOTION_MAT.T + motion_cov
    return new_mean, new_cov


def project(mean: jnp.ndarray, cov: jnp.ndarray,
            bbox_score: jnp.ndarray | float = 0.0,
            use_nsa: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project state into measurement space. Batched over leading dims.

    Ref semantics: kalman_filter.py:121-152.
    """
    h = mean[..., 3]
    std = jnp.stack([
        _STD_WEIGHT_POS * h, _STD_WEIGHT_POS * h,
        jnp.full_like(h, 1e-1), _STD_WEIGHT_POS * h,
    ], axis=-1)
    if use_nsa:
        std = std * (1.0 - jnp.asarray(bbox_score)[..., None])
    innovation_cov = jnp.square(std)[..., :, None] * jnp.eye(4, dtype=mean.dtype)
    proj_mean = mean[..., :4]
    proj_cov = _UPDATE_MAT @ cov @ _UPDATE_MAT.T + innovation_cov
    return proj_mean, proj_cov


def update(mean: jnp.ndarray, cov: jnp.ndarray, measurement: jnp.ndarray,
           bbox_score: jnp.ndarray | float = 0.0,
           use_nsa: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Measurement-correction step. Batched over leading dims.

    Ref semantics: kalman_filter.py:154-189 (Cholesky-solve Kalman gain).
    """
    proj_mean, proj_cov = project(mean, cov, bbox_score, use_nsa)
    # gain = cov @ H^T @ inv(proj_cov); solve via Cholesky of proj_cov.
    b = cov[..., :, :4]  # cov @ H^T for position-observation H
    chol = jnp.linalg.cholesky(proj_cov)
    gain = jax.scipy.linalg.cho_solve(
        (chol, True), jnp.swapaxes(b, -1, -2))  # (..., 4, 8)
    gain = jnp.swapaxes(gain, -1, -2)  # (..., 8, 4)
    innovation = measurement - proj_mean
    new_mean = mean + jnp.einsum('...ij,...j->...i', gain, innovation)
    new_cov = cov - gain @ proj_cov @ jnp.swapaxes(gain, -1, -2)
    return new_mean, new_cov


def gating_distance(mean: jnp.ndarray, cov: jnp.ndarray,
                    measurements: jnp.ndarray,
                    only_position: bool = False) -> jnp.ndarray:
    """Squared Mahalanobis distance of N measurements to one state.

    ``mean`` (..., 8), ``cov`` (..., 8, 8), ``measurements`` (..., N, 4)
    -> (..., N). Ref semantics: kalman_filter.py:191-234.
    """
    proj_mean, proj_cov = project(mean, cov)
    if only_position:
        proj_mean = proj_mean[..., :2]
        proj_cov = proj_cov[..., :2, :2]
        measurements = measurements[..., :2]
    chol = jnp.linalg.cholesky(proj_cov)
    d = measurements - proj_mean[..., None, :]
    z = jax.scipy.linalg.solve_triangular(
        chol, jnp.swapaxes(d, -1, -2), lower=True)
    return jnp.sum(z * z, axis=-2)
