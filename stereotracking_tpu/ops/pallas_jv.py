"""Jonker-Volgenant rectangular assignment as a single Pallas TPU kernel.

The XLA expression of this algorithm (ops/assignment.py:_solve_rect_lap)
pays tens of microseconds of loop overhead per sequential Dijkstra step —
hundreds of steps per frame made association the tracker bottleneck.  Inside
one Pallas kernel the entire solve stays in VMEM: each Dijkstra relaxation
is a handful of 128-lane VPU ops and the scalar bookkeeping is done with
iota-masked selects/reductions (no lane-dim dynamic indexing, no scatters).

Mosaic hygiene learned the hard way:
* loop-carried (1, C) vectors hit layout-unification failures in
  ``scf.yield`` -> ALL vector state lives in VMEM scratch refs; while/fori
  carries are scalars only;
* lane widths below 128 leave padding lanes whose garbage can win an
  unmasked ``jnp.min`` and derail the control flow -> every vector is padded
  to a multiple of 128 lanes and every reduction is explicitly masked, and
  both inner loops carry a safety iteration bound.

Exact same algorithm and results as the XLA version: shortest augmenting
path with potentials over a K x C matrix (C = N real + >=K dummy columns),
scanning the K rows.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e18


def _interpret() -> bool:
    return jax.default_backend() == 'cpu'


def _make_kernel(K: int, C: int, RW: int):
    """K rows, C columns (multiple of 128), RW row-vector width (>=K,
    multiple of 128)."""

    def kernel(cost_ref, c2r_ref, r2c_ref, u_ref, v_ref, minv_ref, way_ref,
               used_ref, row_used_ref):
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, RW), 1)
        col_pad = col_iota >= C  # none, C is exact width
        row_real = row_iota < K

        def sel_col(vec, j):
            return jnp.sum(jnp.where(col_iota == j, vec, 0))

        def sel_row(vec, i):
            return jnp.sum(jnp.where(row_iota == i, vec, 0))

        u_ref[...] = (row_iota * 0).astype(jnp.float32)
        v_ref[...] = (col_iota * 0).astype(jnp.float32)
        c2r_ref[...] = col_iota * 0 - 1
        r2c_ref[...] = row_iota * 0 - 1

        def assign_row(i, _):
            u_i = sel_row(u_ref[...], i)
            cost_i = cost_ref[pl.ds(i, 1), :]
            minv = cost_i - u_i - v_ref[...]
            delta = jnp.min(minv)
            minv_ref[...] = minv - delta
            way_ref[...] = col_iota * 0 - 1
            used_ref[...] = col_iota * 0
            row_used_ref[...] = row_iota * 0
            u_ref[...] = jnp.where(row_iota == i, u_ref[...] + delta,
                                   u_ref[...])
            j0 = jnp.min(
                jnp.where(minv == delta, col_iota, C)).astype(jnp.int32)

            def dij_cond(st):
                j0_, it = st
                return (sel_col(c2r_ref[...], j0_) != -1) & (it <= C)

            def dij_body(st):
                j0_, it = st
                used = used_ref[...] | (col_iota == j0_).astype(jnp.int32)
                used_ref[...] = used
                c2r = c2r_ref[...]
                i0 = sel_col(c2r, j0_)
                row_used_ref[...] = jnp.where(row_iota == i0, 1,
                                              row_used_ref[...])
                u_i0 = sel_row(u_ref[...], i0)
                cur = cost_ref[pl.ds(i0, 1), :] - u_i0 - v_ref[...]
                minv = minv_ref[...]
                improve = (used == 0) & (cur < minv)
                minv = jnp.where(improve, cur, minv)
                way_ref[...] = jnp.where(improve, j0_, way_ref[...])
                masked = jnp.where(used != 0, _INF, minv)
                delta_ = jnp.min(masked)
                j1 = jnp.min(
                    jnp.where(masked == delta_, col_iota, C)
                ).astype(jnp.int32)
                owner_mask = row_used_ref[...] != 0
                u_ref[...] = jnp.where(owner_mask | (row_iota == i),
                                       u_ref[...] + delta_, u_ref[...])
                v_ref[...] = jnp.where(used != 0, v_ref[...] - delta_,
                                       v_ref[...])
                minv_ref[...] = jnp.where(used != 0, minv, minv - delta_)
                return (j1, it + 1)

            j0, _ = jax.lax.while_loop(dij_cond, dij_body, (j0, jnp.int32(0)))

            def aug_cond(st):
                _, done, it = st
                return (done == 0) & (it <= K)

            def aug_body(st):
                j0_, _, it = st
                jprev = sel_col(way_ref[...], j0_)
                owner_prev = sel_col(c2r_ref[...], jnp.maximum(jprev, 0))
                new_row = jnp.where(jprev == -1, i,
                                    owner_prev).astype(jnp.int32)
                c2r_ref[...] = jnp.where(col_iota == j0_, new_row,
                                         c2r_ref[...])
                r2c_ref[...] = jnp.where(row_iota == new_row, j0_,
                                         r2c_ref[...])
                return (jnp.maximum(jprev, 0),
                        jnp.where(jprev == -1, 1, 0).astype(jnp.int32),
                        it + 1)

            jax.lax.while_loop(aug_cond, aug_body,
                               (j0, jnp.int32(0), jnp.int32(0)))
            return 0

        jax.lax.fori_loop(0, K, assign_row, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=())
def solve_rect_lap_pallas(cost: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, C) cost (K <= C) -> (row2col (K,), col2row (C,)) int32.

    The caller guarantees at least K zero-cost dummy columns; this wrapper
    pads C to a multiple of 128 with extra zero dummies (harmless spare
    parking) and rows to a multiple of 8 for sublane alignment.
    """
    K, C = cost.shape
    Cp = max(-(-C // 128) * 128, 128)
    Kp = -(-K // 8) * 8
    RW = max(-(-K // 128) * 128, 128)
    pad_cols = jnp.zeros((K, Cp - C), jnp.float32)       # extra dummies
    ext = jnp.concatenate([cost.astype(jnp.float32), pad_cols], axis=1)
    if Kp > K:
        # all-zero padded rows are indifferent parkers: the optimum never
        # lets them displace a profitable (negative-cost) real match, and
        # any column they do take is masked to -1 below
        ext = jnp.concatenate(
            [ext, jnp.zeros((Kp - K, Cp), jnp.float32)], axis=0)

    c2r, r2c = pl.pallas_call(
        _make_kernel(Kp, Cp, RW),
        out_shape=(jax.ShapeDtypeStruct((1, Cp), jnp.int32),
                   jax.ShapeDtypeStruct((1, RW), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((1, RW), jnp.float32),   # u
            pltpu.VMEM((1, Cp), jnp.float32),   # v
            pltpu.VMEM((1, Cp), jnp.float32),   # minv
            pltpu.VMEM((1, Cp), jnp.int32),     # way
            pltpu.VMEM((1, Cp), jnp.int32),     # used
            pltpu.VMEM((1, RW), jnp.int32),     # row_used
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(ext)
    row2col = r2c.reshape(RW)[:K]
    col2row = c2r.reshape(Cp)[:C]
    # padded rows may have grabbed real... they can't: BIG real costs.
    col2row = jnp.where(col2row >= K, -1, col2row)
    return row2col, col2row
