"""Pallas JV kernel vs the XLA reference solver (interpret mode on CPU)."""
import numpy as np
import pytest

from stereotracking_tpu.ops.assignment import _solve_rect_lap
from stereotracking_tpu.ops.pallas_jv import solve_rect_lap_pallas


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_pallas_matches_xla_solver(seed):
    rng = np.random.RandomState(seed)
    k, n = 8, 12
    # tracking-like shifted costs: mostly positive (worse than dummy),
    # some negative (matchable)
    cost = rng.uniform(-0.9, 0.5, size=(k, n)).astype(np.float32)
    ext = np.concatenate([cost, np.zeros((k, k), np.float32)], axis=1)
    er2c, ec2r = _solve_rect_lap(ext)
    gr2c, gc2r = solve_rect_lap_pallas(ext)
    np.testing.assert_array_equal(np.asarray(gr2c), np.asarray(er2c))
    np.testing.assert_array_equal(np.asarray(gc2r), np.asarray(ec2r))


def test_pallas_dense_conflicts():
    rng = np.random.RandomState(42)
    k = 16
    cost = rng.uniform(-1.0, -0.1, size=(k, k)).astype(np.float32)  # all good
    ext = np.concatenate([cost, np.zeros((k, k), np.float32)], axis=1)
    er2c, _ = _solve_rect_lap(ext)
    gr2c, _ = solve_rect_lap_pallas(ext)
    # optimal cost must match even if tie assignments differ
    e = cost[np.arange(k), np.asarray(er2c)].sum()
    g = cost[np.arange(k), np.asarray(gr2c)].sum()
    assert abs(e - g) < 1e-4
    np.testing.assert_array_equal(np.asarray(gr2c), np.asarray(er2c))
