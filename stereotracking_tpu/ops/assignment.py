"""Exact linear-assignment on device, with ``lap.lapjv`` cost-limit semantics.

The reference tracker calls the C++ Jonker-Volgenant solver
``lap.lapjv(dists, extend_cost=True, cost_limit=1 - match_iou_thr)``
(``/root/reference/mmtrack/models/trackers/ocsort_tracker_disparity.py:260,312``).
The ``lap`` wrapper realises the cost limit by embedding the K x N rectangular
problem into a square (K+N) x (K+N) matrix::

    [ C            limit/2 ]      (top-left: real costs,
    [ limit/2      0       ]       dummies: limit/2, dummy-dummy: 0)

and solving that square LAP exactly.  We reproduce the same embedding with two
twists that make it fixed-shape for XLA: K and N are static maxima, and masked
(inactive) rows / (invalid) columns are wired so they pair with dummies for
free, which provably leaves the optimum of the active sub-problem unchanged.

The square solver is the classic shortest-augmenting-path JV algorithm
(potentials + Dijkstra), expressed with ``lax.while_loop`` over vectorised
column relaxations.  In tracking workloads almost every augmenting path has
length 1, so the inner loop exits after one or two iterations.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = 1e4      # forbidden-pair cost; >> any reachable total assignment cost
_INF = 1e18     # Dijkstra sentinel


def solve_square_lap(cost: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact square LAP. Returns (row_to_col, col_to_row), both (S,) int32.

    Shortest-augmenting-path Jonker-Volgenant with row/column potentials.
    """
    S = cost.shape[0]
    cost = jnp.asarray(cost, jnp.float32)

    def assign_row(carry, i):
        u, v, col2row = carry

        # --- first relaxation: from the new row i (virtual source column) ---
        minv = cost[i] - u[i] - v
        way = jnp.full((S,), -1, jnp.int32)       # predecessor col; -1 = row i
        used = jnp.zeros((S,), jnp.bool_)
        j1 = jnp.argmin(minv)
        delta = minv[j1]
        u = u.at[i].add(delta)
        minv = minv - delta
        j0 = j1.astype(jnp.int32)

        # State: (u, v, minv, way, used, j0)
        def cond(st):
            u_, v_, minv_, way_, used_, j0_ = st
            return col2row[j0_] != -1

        def body(st):
            u_, v_, minv_, way_, used_, j0_ = st
            used_ = used_.at[j0_].set(True)
            i0 = col2row[j0_]
            cur = cost[i0] - u_[i0] - v_
            improve = jnp.logical_and(jnp.logical_not(used_), cur < minv_)
            minv_ = jnp.where(improve, cur, minv_)
            way_ = jnp.where(improve, j0_, way_)
            masked = jnp.where(used_, _INF, minv_)
            j1_ = jnp.argmin(masked).astype(jnp.int32)
            delta_ = masked[j1_]
            u_ = u_.at[i].add(delta_)
            owners = jnp.where(used_, col2row, 0)
            u_ = u_.at[owners].add(jnp.where(used_, delta_, 0.0))
            v_ = v_ - jnp.where(used_, delta_, 0.0)
            minv_ = jnp.where(used_, minv_, minv_ - delta_)
            return (u_, v_, minv_, way_, used_, j1_)

        u, v, minv, way, used, j0 = jax.lax.while_loop(
            cond, body, (u, v, minv, way, used, j0))

        # --- augment along predecessor chain ---
        def aug_cond(st):
            _, j0_, done = st
            return jnp.logical_not(done)

        def aug_body(st):
            c2r, j0_, _ = st
            jprev = way[j0_]
            new_row = jnp.where(jprev == -1, i, c2r[jnp.maximum(jprev, 0)])
            c2r = c2r.at[j0_].set(new_row.astype(jnp.int32))
            return (c2r, jnp.maximum(jprev, 0), jprev == -1)

        col2row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col2row, j0, jnp.asarray(False)))
        return (u, v, col2row), None

    u0 = jnp.zeros((S,), jnp.float32)
    v0 = jnp.zeros((S,), jnp.float32)
    c2r0 = jnp.full((S,), -1, jnp.int32)
    (_, _, col2row), _ = jax.lax.scan(
        assign_row, (u0, v0, c2r0), jnp.arange(S, dtype=jnp.int32))
    row2col = jnp.full((S,), -1, jnp.int32).at[col2row].set(
        jnp.arange(S, dtype=jnp.int32))
    return row2col, col2row


def _solve_rect_lap(cost: jnp.ndarray,
                    scan_mask: jnp.ndarray | None = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """JV shortest-augmenting-path for a K x C problem (K <= C), every
    scanned row assigned to a distinct column.

    Scatter-free inner loop: the per-iteration potential updates are plain
    vector selects plus two scalar writes, which keeps each Dijkstra step a
    handful of fused VPU ops on TPU (the naive square embedding costs 2x the
    sequential steps and a 128-wide scatter per step).

    ``scan_mask`` (K,) selects which rows to assign; unscanned rows stay -1.
    The sequential outer loop runs exactly popcount(scan_mask) iterations —
    in tracking, after the trivial-component fast paths, that is usually a
    handful of genuinely conflicted rows instead of all K slots.
    """
    K, C = cost.shape
    cost = jnp.asarray(cost, jnp.float32)

    def assign_row(carry, i):
        u, v, col2row, row2col = carry

        minv = cost[i] - u[i] - v
        way = jnp.full((C,), -1, jnp.int32)
        used = jnp.zeros((C,), jnp.bool_)
        row_used = jnp.zeros((K,), jnp.bool_)
        j1 = jnp.argmin(minv)
        delta = minv[j1]
        u = u.at[i].add(delta)
        minv = minv - delta
        j0 = j1.astype(jnp.int32)

        # State: (u, v, minv, way, used, row_used, j0)
        def cond(st):
            *_, j0_ = st
            return col2row[j0_] != -1

        def body(st):
            u_, v_, minv_, way_, used_, row_used_, j0_ = st
            used_ = used_.at[j0_].set(True)
            i0 = col2row[j0_]
            row_used_ = row_used_.at[i0].set(True)
            cur = cost[i0] - u_[i0] - v_
            improve = jnp.logical_and(jnp.logical_not(used_), cur < minv_)
            minv_ = jnp.where(improve, cur, minv_)
            way_ = jnp.where(improve, j0_, way_)
            masked = jnp.where(used_, _INF, minv_)
            j1_ = jnp.argmin(masked).astype(jnp.int32)
            delta_ = masked[j1_]
            u_ = jnp.where(row_used_, u_ + delta_, u_).at[i].add(delta_)
            v_ = jnp.where(used_, v_ - delta_, v_)
            minv_ = jnp.where(used_, minv_, minv_ - delta_)
            return (u_, v_, minv_, way_, used_, row_used_, j1_)

        u, v, minv, way, used, row_used, j0 = jax.lax.while_loop(
            cond, body, (u, v, minv, way, used, row_used, j0))

        def aug_cond(st):
            _, _, j0_, done = st
            return jnp.logical_not(done)

        def aug_body(st):
            c2r, r2c, j0_, _ = st
            jprev = way[j0_]
            new_row = jnp.where(jprev == -1, i,
                                c2r[jnp.maximum(jprev, 0)]).astype(jnp.int32)
            c2r = c2r.at[j0_].set(new_row)
            r2c = r2c.at[new_row].set(j0_)
            return (c2r, r2c, jnp.maximum(jprev, 0), jprev == -1)

        col2row, row2col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col2row, row2col, j0, jnp.asarray(False)))
        return (u, v, col2row, row2col), None

    u0 = jnp.zeros((K,), jnp.float32)
    v0 = jnp.zeros((C,), jnp.float32)
    c2r0 = jnp.full((C,), -1, jnp.int32)
    r2c0 = jnp.full((K,), -1, jnp.int32)

    if scan_mask is None:
        (_, _, col2row, row2col), _ = jax.lax.scan(
            assign_row, (u0, v0, c2r0, r2c0), jnp.arange(K, dtype=jnp.int32))
        return row2col, col2row

    # while-loop over only the masked rows
    def outer_cond(st):
        carry, remaining = st
        return jnp.any(remaining)

    def outer_body(st):
        carry, remaining = st
        i = jnp.argmax(remaining).astype(jnp.int32)
        carry, _ = assign_row(carry, i)
        return carry, remaining.at[i].set(False)

    (_, _, col2row, row2col), _ = jax.lax.while_loop(
        outer_cond, outer_body,
        ((u0, v0, c2r0, r2c0), jnp.asarray(scan_mask)))
    return row2col, col2row


@partial(jax.jit, static_argnames=())
def linear_assignment_with_limit(
        cost: jnp.ndarray, row_mask: jnp.ndarray, col_mask: jnp.ndarray,
        cost_limit: jnp.ndarray | float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked rectangular LAP with ``lap.lapjv`` cost-limit semantics.

    Equivalence: the lap embedding's objective is
    ``sum_M c_ij + (K-|M|) L/2 + (N-|M|) L/2``; dropping constants this is
    ``sum_M (c_ij - L)`` — i.e. every row picks either a real column at
    shifted cost ``c - L`` or one of K interchangeable dummies at 0.  That is
    a K x (N+K) rectangular LAP scanned over rows only; pairs with
    ``c > L`` are never matched (they would raise the objective).

    Args:
        cost: (K, N) float cost matrix (entries for masked rows/cols ignored).
        row_mask: (K,) bool — active rows.
        col_mask: (N,) bool — valid columns.
        cost_limit: scalar; a pair is only worth matching when globally
            cheaper than leaving row and column unmatched at ``limit/2`` each.

    Returns:
        (row_assign, col_assign): (K,) and (N,) int32 matched index or -1.
        Masked rows/columns are always -1.
    """
    K, N = cost.shape
    limit = jnp.float32(cost_limit)
    costf = cost.astype(jnp.float32)

    # --- trivially-optimal component fast paths -------------------------
    # The objective decomposes over connected components of the sub-limit
    # candidate graph. Two component shapes cover almost every tracking
    # frame and resolve with pure vector ops:
    #   (a) rows with no candidate column -> unmatched;
    #   (b) "private-star" rows: every candidate column of row i is adjacent
    #       to row i only -> match the cheapest candidate.
    candidate = row_mask[:, None] & col_mask[None, :] & (costf < limit)
    row_deg = jnp.sum(candidate, axis=1)
    col_deg = jnp.sum(candidate, axis=0)
    col_private = col_deg == 1
    star = row_mask & (row_deg > 0) & jnp.all(
        jnp.logical_not(candidate) | col_private[None, :], axis=1)
    star_col = jnp.argmin(
        jnp.where(candidate, costf, _INF), axis=1).astype(jnp.int32)

    need_jv = row_mask & (row_deg > 0) & jnp.logical_not(star)

    taken = jnp.zeros((N,), bool).at[
        jnp.where(star, star_col, N)].set(True, mode='drop')
    col_mask2 = col_mask & jnp.logical_not(taken)

    real = jnp.where(need_jv[:, None] & col_mask2[None, :],
                     costf - limit, _BIG)
    ext = jnp.concatenate([real, jnp.zeros((K, K), jnp.float32)], axis=1)

    # An experimental Pallas VMEM-resident JV kernel was removed: its
    # Dijkstra/augmenting while_loops have data-dependent trip counts and a
    # runaway device loop wedges the single-client TPU session for hours.
    # The XLA solver below is exact (lap.lapjv cost-limit semantics) and
    # assignment is ~1% of frame time, so the kernel bought nothing but risk.
    row2col, col2row = _solve_rect_lap(ext, scan_mask=need_jv)

    row_assign = jnp.where(need_jv & (row2col < N) & (row2col >= 0),
                           row2col, -1)
    row_assign = jnp.where(star, star_col, row_assign)
    # Guard: a row must never land on a masked/over-limit column via BIG.
    row_assign = jnp.where(
        (row_assign >= 0) & col_mask[jnp.clip(row_assign, 0, N - 1)],
        row_assign, -1)
    col_assign = jnp.full((N,), -1, jnp.int32).at[
        jnp.where(row_assign >= 0, row_assign, N)].set(
        jnp.arange(K, dtype=jnp.int32), mode='drop')
    return row_assign, col_assign
