"""Numerical parity tests for the batched Kalman filter.

The expected values are computed by an in-test numpy replica of the reference
equations (/root/reference/mmtrack/models/motion/kalman_filter.py) — the
replica is the test oracle, not shipped code.
"""
import numpy as np
import scipy.linalg

from stereotracking_tpu.models import kalman as K


class NumpyKF:
    """Test oracle replicating the reference filter's equations."""

    def __init__(self):
        ndim, dt = 4, 1.0
        self._motion_mat = np.eye(2 * ndim)
        for i in range(ndim):
            self._motion_mat[i, ndim + i] = dt
        self._update_mat = np.eye(ndim, 2 * ndim)
        self._swp = 1.0 / 20
        self._swv = 1.0 / 160

    def initiate(self, m):
        mean = np.r_[m, np.zeros_like(m)]
        std = [2 * self._swp * m[3], 2 * self._swp * m[3], 1e-2,
               2 * self._swp * m[3], 10 * self._swv * m[3],
               10 * self._swv * m[3], 1e-5, 10 * self._swv * m[3]]
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        std = [self._swp * mean[3], self._swp * mean[3], 1e-2,
               self._swp * mean[3], self._swv * mean[3], self._swv * mean[3],
               1e-5, self._swv * mean[3]]
        q = np.diag(np.square(std))
        return self._motion_mat @ mean, \
            self._motion_mat @ cov @ self._motion_mat.T + q

    def project(self, mean, cov):
        std = [self._swp * mean[3], self._swp * mean[3], 1e-1,
               self._swp * mean[3]]
        r = np.diag(np.square(std))
        return self._update_mat @ mean, \
            self._update_mat @ cov @ self._update_mat.T + r

    def update(self, mean, cov, m):
        pm, pc = self.project(mean, cov)
        chol, lower = scipy.linalg.cho_factor(pc, lower=True)
        gain = scipy.linalg.cho_solve(
            (chol, lower), (cov @ self._update_mat.T).T).T
        innov = m - pm
        return mean + innov @ gain.T, cov - gain @ pc @ gain.T

    def gating_distance(self, mean, cov, ms):
        pm, pc = self.project(mean, cov)
        chol = np.linalg.cholesky(pc)
        d = ms - pm
        z = scipy.linalg.solve_triangular(chol, d.T, lower=True)
        return np.sum(z * z, axis=0)


def _measurements(n, seed=0):
    rng = np.random.RandomState(seed)
    cx = rng.uniform(50, 1200, n)
    cy = rng.uniform(50, 700, n)
    a = rng.uniform(0.4, 2.5, n)
    h = rng.uniform(8, 120, n)
    return np.stack([cx, cy, a, h], -1).astype(np.float32)


def test_initiate_matches_reference():
    ms = _measurements(16)
    mean, cov = K.initiate(ms)
    oracle = NumpyKF()
    for i in range(16):
        em, ec = oracle.initiate(ms[i])
        np.testing.assert_allclose(np.asarray(mean)[i], em, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cov)[i], ec, rtol=1e-5, atol=1e-8)


def test_predict_update_cycle_matches_reference():
    ms = _measurements(8, seed=1)
    new_ms = _measurements(8, seed=2)
    oracle = NumpyKF()
    mean, cov = K.initiate(ms)
    mean, cov = K.predict(mean, cov)
    mean2, cov2 = K.update(mean, cov, new_ms)
    for i in range(8):
        em, ec = oracle.initiate(ms[i])
        em, ec = oracle.predict(em, ec)
        np.testing.assert_allclose(np.asarray(mean)[i], em, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(cov)[i], ec, rtol=1e-3, atol=1e-5)
        em2, ec2 = oracle.update(em, ec, new_ms[i])
        np.testing.assert_allclose(np.asarray(mean2)[i], em2, rtol=1e-3,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(cov2)[i], ec2, rtol=1e-2,
                                   atol=1e-4)


def test_multi_step_stability_and_parity():
    """10 predict/update rounds keep parity with the numpy oracle."""
    m0 = _measurements(1, seed=3)[0]
    oracle = NumpyKF()
    em, ec = oracle.initiate(m0)
    mean, cov = K.initiate(m0[None])
    rng = np.random.RandomState(4)
    for _ in range(10):
        em, ec = oracle.predict(em, ec)
        mean, cov = K.predict(mean, cov)
        m = em[:4] + rng.uniform(-2, 2, 4) * np.array([1, 1, 0.01, 1])
        m = m.astype(np.float32)
        em, ec = oracle.update(em, ec, m)
        mean, cov = K.update(mean, cov, m[None])
    np.testing.assert_allclose(np.asarray(mean)[0], em, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(cov)[0], ec, rtol=1e-2, atol=1e-3)


def test_gating_distance_matches_reference():
    m0 = _measurements(1, seed=5)[0]
    dets = _measurements(12, seed=6)
    oracle = NumpyKF()
    em, ec = oracle.initiate(m0)
    em, ec = oracle.predict(em, ec)
    mean, cov = K.initiate(m0[None])
    mean, cov = K.predict(mean, cov)
    got = np.asarray(K.gating_distance(mean[0], cov[0], dets))
    exp = oracle.gating_distance(em, ec, dets)
    np.testing.assert_allclose(got, exp, rtol=1e-3, atol=1e-3)


def test_batched_gating_over_slots():
    ms = _measurements(4, seed=7)
    dets = _measurements(6, seed=8)
    mean, cov = K.initiate(ms)
    d = np.asarray(K.gating_distance(mean, cov, np.broadcast_to(
        dets, (4, 6, 4))))
    assert d.shape == (4, 6)
    for i in range(4):
        di = np.asarray(K.gating_distance(mean[i], cov[i], dets))
        np.testing.assert_allclose(d[i], di, rtol=1e-4, atol=1e-4)
