"""Exhaustive verification of the JV assignment vs a scipy-based oracle.

The oracle rebuilds the exact square embedding that the ``lap`` python wrapper
uses for ``extend_cost=True, cost_limit=L`` and solves it with
``scipy.optimize.linear_sum_assignment`` — on random float matrices the
optimum is unique, so assignments must agree exactly.
"""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from stereotracking_tpu.ops.assignment import (linear_assignment_with_limit,
                                               solve_square_lap)


def lapjv_oracle(cost, cost_limit):
    """Replicates lap.lapjv(cost, extend_cost=True, cost_limit=...)."""
    n, m = cost.shape
    ext = np.full((n + m, n + m), cost_limit / 2.0)
    ext[n:, m:] = 0.0
    ext[:n, :m] = cost
    rr, cc = linear_sum_assignment(ext)
    row = np.full(n, -1, np.int64)
    col = np.full(m, -1, np.int64)
    for r, c in zip(rr, cc):
        if r < n and c < m:
            row[r] = c
            col[c] = r
    return row, col


def test_square_lap_matches_scipy():
    rng = np.random.RandomState(0)
    for s in [1, 2, 5, 16]:
        cost = rng.uniform(0, 1, size=(s, s)).astype(np.float32)
        r2c, c2r = solve_square_lap(cost)
        r2c = np.asarray(r2c)
        rr, cc = linear_sum_assignment(cost)
        got = cost[np.arange(s), r2c].sum()
        exp = cost[rr, cc].sum()
        assert got == pytest.approx(exp, abs=1e-4)


@pytest.mark.parametrize('k,n,seed', [(3, 5, 0), (5, 3, 1), (8, 8, 2),
                                      (1, 10, 3), (10, 1, 4), (12, 7, 5)])
def test_cost_limit_semantics_match_lapjv(k, n, seed):
    rng = np.random.RandomState(seed)
    # IoU-like cost: mostly ~1 (no overlap), some matchable entries
    cost = 1.0 - (rng.uniform(0, 1, size=(k, n)) ** 3)
    cost = cost.astype(np.float32)
    limit = 0.9
    erow, ecol = lapjv_oracle(cost.astype(np.float64), limit)
    grow, gcol = linear_assignment_with_limit(
        cost, np.ones(k, bool), np.ones(n, bool), limit)
    np.testing.assert_array_equal(np.asarray(grow), erow)
    np.testing.assert_array_equal(np.asarray(gcol), ecol)


def test_cost_limit_rejects_expensive_pairs():
    cost = np.array([[0.95]], np.float32)  # above limit -> unmatched
    row, col = linear_assignment_with_limit(
        cost, np.ones(1, bool), np.ones(1, bool), 0.9)
    assert int(row[0]) == -1 and int(col[0]) == -1
    cost = np.array([[0.85]], np.float32)  # below limit -> matched
    row, col = linear_assignment_with_limit(
        cost, np.ones(1, bool), np.ones(1, bool), 0.9)
    assert int(row[0]) == 0 and int(col[0]) == 0


def test_masked_rows_cols_do_not_perturb_active_subproblem():
    rng = np.random.RandomState(7)
    K, N = 16, 16
    cost_full = (1.0 - rng.uniform(0, 1, size=(K, N)) ** 3).astype(np.float32)
    row_mask = rng.rand(K) < 0.6
    col_mask = rng.rand(N) < 0.6
    limit = 0.9

    active = cost_full[np.ix_(row_mask, col_mask)]
    erow_a, ecol_a = lapjv_oracle(active.astype(np.float64), limit)

    grow, gcol = linear_assignment_with_limit(
        cost_full, row_mask, col_mask, limit)
    grow, gcol = np.asarray(grow), np.asarray(gcol)

    # masked slots always unmatched
    assert (grow[~row_mask] == -1).all()
    assert (gcol[~col_mask] == -1).all()

    # compressed view must equal the oracle of the active subproblem
    ridx = np.where(row_mask)[0]
    cidx = np.where(col_mask)[0]
    col_pos = {c: i for i, c in enumerate(cidx)}
    for ai, i in enumerate(ridx):
        g = grow[i]
        e = erow_a[ai]
        if e == -1:
            assert g == -1
        else:
            assert g != -1 and col_pos[g] == e


def test_fuzz_many_random_instances():
    rng = np.random.RandomState(11)
    for trial in range(30):
        k = rng.randint(1, 12)
        n = rng.randint(1, 12)
        cost = rng.uniform(0, 2, size=(k, n)).astype(np.float32)
        limit = float(rng.uniform(0.3, 1.5))
        erow, ecol = lapjv_oracle(cost.astype(np.float64), limit)
        grow, gcol = linear_assignment_with_limit(
            cost, np.ones(k, bool), np.ones(n, bool), limit)
        # compare total cost (assignment may differ only on exact ties)
        def total(row):
            idx = np.where(row >= 0)[0]
            matched = len(idx)
            return cost[idx, row[idx]].sum() + \
                ((k - matched) + (n - matched)) * limit / 2.0
        assert total(np.asarray(grow)) == pytest.approx(total(erow), abs=1e-3)


def test_sparse_tracking_like_instances_hit_fast_paths():
    """Near-diagonal IoU costs: most rows resolve via the star fast path;
    result must still match the global lap optimum exactly."""
    rng = np.random.RandomState(21)
    for trial in range(20):
        k = rng.randint(2, 20)
        n = rng.randint(2, 20)
        cost = np.ones((k, n), np.float32)  # no overlap anywhere
        # each row overlaps its "own" detection strongly
        for i in range(min(k, n)):
            cost[i, i] = rng.uniform(0.0, 0.5)
        # a few conflicted pairs sharing detections
        for _ in range(rng.randint(0, 4)):
            i, j = rng.randint(0, k), rng.randint(0, n)
            cost[i, j] = rng.uniform(0.0, 0.9)
        limit = 0.9
        erow, ecol = lapjv_oracle(cost.astype(np.float64), limit)
        grow, gcol = linear_assignment_with_limit(
            cost, np.ones(k, bool), np.ones(n, bool), limit)
        np.testing.assert_array_equal(np.asarray(grow), erow, f'trial {trial}')
        np.testing.assert_array_equal(np.asarray(gcol), ecol, f'trial {trial}')
