"""Native C++ LAPJV vs scipy embedding and vs the on-device solver."""
import numpy as np
import pytest

from stereotracking_tpu._native import lapjv_cost_limit, native_available
from test_assignment import lapjv_oracle


def test_native_builds():
    assert native_available(), 'C++ lapjv failed to build/load'


@pytest.mark.parametrize('seed', range(8))
def test_native_matches_scipy_embedding(seed):
    rng = np.random.RandomState(seed)
    k, n = rng.randint(1, 15), rng.randint(1, 15)
    cost = (1.0 - rng.uniform(0, 1, (k, n)) ** 3)
    limit = float(rng.uniform(0.5, 1.2))
    erow, ecol = lapjv_oracle(cost, limit)
    grow, gcol = lapjv_cost_limit(cost, limit)
    # optimal objective identical (tie assignments may differ)
    def total(row):
        idx = np.where(row >= 0)[0]
        m = len(idx)
        return cost[idx, row[idx]].sum() + ((k - m) + (n - m)) * limit / 2
    assert total(grow) == pytest.approx(total(erow), abs=1e-9)
    np.testing.assert_array_equal(grow, erow)
    np.testing.assert_array_equal(gcol, ecol)


def test_native_matches_device_solver():
    from stereotracking_tpu.ops.assignment import linear_assignment_with_limit
    rng = np.random.RandomState(3)
    k, n = 12, 10
    cost = (1.0 - rng.uniform(0, 1, (k, n)) ** 3).astype(np.float32)
    nrow, ncol = lapjv_cost_limit(cost.astype(np.float64), 0.9)
    drow, dcol = linear_assignment_with_limit(
        cost, np.ones(k, bool), np.ones(n, bool), 0.9)
    np.testing.assert_array_equal(np.asarray(drow), nrow)
    np.testing.assert_array_equal(np.asarray(dcol), ncol)
