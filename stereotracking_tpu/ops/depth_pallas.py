"""Fused Pallas TPU kernel for per-box corner-guided depth extraction.

Replaces the XLA formulation of ``ops/depth.py:extract_box_depths_disp``
(reference semantics: /root/reference/mmtrack/models/mot/
ocsort_disparity.py:132-175) for the production serving path.  The XLA
version costs ~14 ms per 8-stream 1080p step on v5e, split between a
full-frame strided pyramid build, a vmapped dynamic-slice window gather
(lowered as gather), and a 16-step bisection that bounces (R, 9216)
intermediates through HBM each step.  This kernel removes all three:

* NO full-resolution copy at all: each box's window is DMA'd straight out
  of the (H, W) f32 disparity map with a per-box dynamic offset (the
  window start is clamped to the frame so no padded copy is needed; the
  in-box mask is expressed in absolute coordinates instead).
* Boxes larger than the window use power-of-two row-subsampled views
  (``disp[::2**l]`` — sublane strides only, the lane-strided column
  subsampling that made the XLA pyramid slow is replaced by an in-kernel
  ``col % stride == 0`` mask over an 8x-wide window).
* The 16-step uint16-domain bisection (ops/depth.py:_value_at_ranks_desc16)
  runs on the VMEM-resident window with scalar per-rank state — no HBM
  traffic after the single window DMA.  Window DMAs are double-buffered
  across boxes.
* The scalar epilogue (corner votes, truncated-mean segment arithmetic) is
  NOT in the kernel: the kernel emits per-box sufficient statistics
  (n, 8 rank values, boundary counts, below-boundary sums) and the exact
  reference arithmetic runs as ordinary XLA on (B,)-sized arrays.

Exactness vs ``extract_box_depths_disp``: every integer-domain quantity
(validity threshold, rank values, boundary counts) is bit-identical — the
validity test ``0 < depth < 150`` is precomputed as an integer disparity
threshold using the SAME XLA division the base path uses (evaluated at
runtime so XLA cannot constant-fold it with different semantics).  The one
tolerated deviation: ``sum_lt`` (the f32 sum of depths strictly below a
rank boundary) is accumulated in a different reduction order than XLA's,
so final depths can differ by float-sum reassociation ULPs
(tests/test_depth_pallas.py bounds this at rtol 1e-6 and pins the integer
outputs exactly).

vmap: wrapped in ``jax.custom_batching.custom_vmap`` — vmapping (as the
multi-stream tracker does) folds the batch axis into the kernel's native
stream axis instead of relying on pallas batching of manual DMAs.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .depth import MAX_BOX_W, MAX_DEPTH, _PYR_LEVELS

_NS = 10          # scalars per box: sid, lvl, oy, ox, dya, nr, dxa, ncl,
                  # stride, rmin
_NOUT = 24        # padded stats row: n, r_raw[8], cnt_lt[7], sum_lt[7]


def _f_depth(r, bf):
    """Exact base-path depth formula on an integer raw disparity."""
    return bf / (r.astype(jnp.float32) / 16.0 + 1e-6)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_dims(crop: int, w: int) -> Tuple[int, int, int, int]:
    """Window/source lane widths satisfying mosaic's DMA tiling rule:
    lane-dim slice widths AND offsets must be multiples of the 128 lane
    tile.  Window starts are aligned down to 128 (the in-window column
    mask absorbs the shift via ``dxa``), so windows carry 128 extra
    columns.  crop % 16 == 0 keeps 8*crop a multiple of 128."""
    wsm = _round_up(crop, 128) + 128        # level-0 window lane width
    wbg = 8 * crop + 128                    # pyramid window lane width
    wps = _round_up(max(w, wsm), 128)       # level-0 source width
    wpb = _round_up(max(w, wbg), 128)       # pyramid source width
    return wsm, wbg, wps, wpb


@functools.partial(jax.jit,
                   static_argnames=('bf', 'crop', 'interpret'))
def _stats_pallas(disp: jnp.ndarray, scal: jnp.ndarray, bf: float,
                  crop: int, interpret: bool) -> jnp.ndarray:
    """Run the kernel: (S, H, W) disp + (S*B, NS) scalars -> (S*B, 24)."""
    s, h, w = disp.shape
    sb = scal.shape[0]

    # Window row count: crop + 16 so the DMA row offset can be aligned
    # down to the sublane tile (8) — mosaic requires it — while still
    # covering crop in-frame rows after the worst-case clamp (see
    # _prep_scalars).  Sources are padded so every row dim is >= wr and
    # divisible by 8 (pad value 0 == invalid disparity); production 1080p
    # shapes (1088/544/272/136 rows) never pad.  Lane dims follow
    # _lane_dims: source widths are 128-multiples >= the window width.
    wr = crop + 16
    wsm, wbg, wps, wpb = _lane_dims(crop, w)

    d0 = disp
    ph0 = _round_up(max(h, wr), 8)
    if ph0 != h or wps != w:
        d0 = jnp.pad(disp, ((0, 0), (0, ph0 - h), (0, wps - w)))
    pyrs = []
    prev = disp
    for _ in range(_PYR_LEVELS - 1):
        prev = prev[:, ::2]
        lh = prev.shape[1]
        ph = _round_up(max(lh, wr), 8)
        if ph != lh or wpb != w:
            pyrs.append(jnp.pad(prev, ((0, 0), (0, ph - lh),
                                       (0, wpb - w))))
        else:
            pyrs.append(prev)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((sb, _NOUT), lambda i, s: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, crop + 16, wsm), jnp.float32),
            pltpu.VMEM((2, crop + 16, wbg), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        functools.partial(_kernel_impl, crop=crop, bf=bf, wsm=wsm, wbg=wbg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sb, _NOUT), jnp.float32),
        interpret=interpret,
    )(scal, d0, pyrs[0], pyrs[1], pyrs[2])


def _kernel_impl(scal_ref, disp_ref, pyr2_ref, pyr4_ref, pyr8_ref,
                      out_ref, ws_ref, wb_ref, sem_s, sem_b, *, crop: int,
                      bf: float, wsm: int, wbg: int):
    k = pl.program_id(0)
    n_k = pl.num_programs(0)
    pyrs = (pyr2_ref, pyr4_ref, pyr8_ref)

    def copies(i, slot):
        sid = scal_ref[i, 0]
        # _prep_scalars aligns the row start down to the sublane tile
        # and the column start down to the lane tile; mosaic needs the
        # hints to prove the sliced DMAs legal
        oy = pl.multiple_of(scal_ref[i, 2], 8)
        ox = pl.multiple_of(scal_ref[i, 3], 128)
        small = pltpu.make_async_copy(
            disp_ref.at[sid, pl.ds(oy, crop + 16), pl.ds(ox, wsm)],
            ws_ref.at[slot], sem_s.at[slot])
        bigs = [pltpu.make_async_copy(
            p.at[sid, pl.ds(oy, crop + 16), pl.ds(ox, wbg)],
            wb_ref.at[slot], sem_b.at[slot]) for p in pyrs]
        return small, bigs

    def issue(i, slot):
        lvl = scal_ref[i, 1]
        small, bigs = copies(i, slot)

        @pl.when(lvl == 0)
        def _():
            small.start()

        for l, big in enumerate(bigs):
            @pl.when(lvl == l + 1)
            def _(big=big):
                big.start()

    @pl.when(k == 0)
    def _():
        issue(0, 0)

    @pl.when(k + 1 < n_k)
    def _():
        issue(k + 1, jax.lax.rem(k + 1, 2))

    slot = jax.lax.rem(k, 2)
    lvl = scal_ref[k, 1]
    dya = scal_ref[k, 4]
    nr = scal_ref[k, 5]
    dxa = scal_ref[k, 6]
    ncl = scal_ref[k, 7]
    stride = scal_ref[k, 8]
    rmin = scal_ref[k, 9]
    small, bigs = copies(k, slot)

    def body(win):
        raw = jnp.round(win * 16.0).astype(jnp.int32)
        # Compact the stride-subsampled in-box columns onto 128 lanes so the
        # 16x7-pass rank bisection below runs on (rows, 128) instead of the
        # full (rows, 8*crop) window — 7x less VPU work for pyramid boxes.
        # The gather is two MXU selection matmuls on the hi/lo bytes: each
        # output column selects exactly ONE source column (sel is 0/1 with a
        # single 1), and byte values <= 255 are exact in bf16, so the result
        # is bit-exact integer selection.
        wlane = raw.shape[1]
        ci = jax.lax.broadcasted_iota(jnp.int32, (wlane, 128), 0)
        co = jax.lax.broadcasted_iota(jnp.int32, (wlane, 128), 1)
        sel = (ci == dxa + co * stride).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        hi_c = jax.lax.dot_general((raw >> 8).astype(jnp.bfloat16), sel, dn,
                                   preferred_element_type=jnp.float32)
        lo_c = jax.lax.dot_general((raw & 255).astype(jnp.bfloat16), sel, dn,
                                   preferred_element_type=jnp.float32)
        rawc = (hi_c * 256.0 + lo_c).astype(jnp.int32)      # (rows, 128)
        rr = jax.lax.broadcasted_iota(jnp.int32, rawc.shape, 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, rawc.shape, 1)
        okb = (rr >= dya) & (rr < dya + nr) & (cc * stride < ncl)
        masked = jnp.where(okb & (rawc >= rmin), rawc, -1)
        n = jnp.sum((masked >= 0).astype(jnp.int32))

        nf = n.astype(jnp.float32)
        ws0 = (0.4 * nf).astype(jnp.int32)
        ws1 = (0.25 * nf).astype(jnp.int32)
        we0 = (0.4 * nf + 0.6 * nf).astype(jnp.int32)
        we1 = (0.25 * nf + 0.6 * nf).astype(jnp.int32)
        we2 = (0.6 * nf).astype(jnp.int32)
        m_fb = jnp.maximum(jnp.where(n > 1, n - 1, n), 1)
        ranks = [jnp.maximum(n // 2, 0),
                 jnp.maximum(we0, 1) - 1, jnp.maximum(we1, 1) - 1,
                 jnp.maximum(we2, 1) - 1,
                 jnp.maximum(ws0, 1) - 1, jnp.maximum(ws1, 1) - 1,
                 m_fb - 1]

        # note: batching the 7 bisections into one (7, rows, 128) compare +
        # axis=(1,2) reduction SIGABRTs the mosaic compiler (measured); the
        # scalar-chained form below compiles and the kernel is ~2x the XLA
        # slice even so.
        los = [jnp.int32(0)] * len(ranks)
        his = [jnp.int32(65535)] * len(ranks)
        chs = [jnp.int32(0)] * len(ranks)
        for _ in range(16):
            for j, rank in enumerate(ranks):
                mid = los[j] + (his[j] - los[j] + 1) // 2
                cnt = jnp.sum((masked >= mid).astype(jnp.int32))
                ge = cnt >= rank + 1
                los[j] = jnp.where(ge, mid, los[j])
                his[j] = jnp.where(ge, his[j], mid - 1)
                chs[j] = jnp.where(ge, chs[j], cnt)
        v_max = jnp.maximum(jnp.max(masked), 0)

        r_raw = [los[0], los[1], los[2], los[3], los[4], los[5], v_max,
                 los[6]]
        dvals = _f_depth(masked, jnp.float32(bf))
        sums = []
        for j in (1, 2, 3, 4, 5, 6):
            below = masked > los[j]
            sums.append(jnp.sum(jnp.where(below, dvals, 0.0)))
        cnt_lt = [chs[1], chs[2], chs[3], chs[4], chs[5],
                  jnp.int32(0), chs[6]]
        sum_lt = [sums[0], sums[1], sums[2], sums[3], sums[4],
                  jnp.float32(0.0), sums[5]]

        out_ref[k, 0] = nf
        for j in range(8):
            out_ref[k, 1 + j] = r_raw[j].astype(jnp.float32)
        for j in range(7):
            out_ref[k, 9 + j] = cnt_lt[j].astype(jnp.float32)
            out_ref[k, 16 + j] = sum_lt[j]

    @pl.when(lvl == 0)
    def _():
        small.wait()
        body(ws_ref[slot])

    for l, big in enumerate(bigs):
        @pl.when(lvl == l + 1)
        def _(big=big):
            big.wait()
            body(wb_ref[slot])


def _prep_scalars(boxes: jnp.ndarray, h: int, w: int, crop: int,
                  rmin: jnp.ndarray) -> jnp.ndarray:
    """Per-box kernel scalars, (B, NS-1) int32 WITHOUT the stream id.

    Mirrors the base path's window/level selection
    (ops/depth.py:extract_box_depths_disp per_box) with window starts
    clamped into the source arrays instead of relying on padded copies.
    """
    x1 = boxes[:, 0].astype(jnp.int32)
    y1 = boxes[:, 1].astype(jnp.int32)
    x2 = boxes[:, 2].astype(jnp.int32)
    y2 = boxes[:, 3].astype(jnp.int32)
    bw = x2 - x1
    bh = y2 - y1

    size = jnp.maximum(bw, bh)
    level = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(
            size.astype(jnp.float32) / crop, 1.0))).astype(jnp.int32),
        0, _PYR_LEVELS - 1)
    stride = jnp.int32(1) << level

    y1c = jnp.clip(y1, 0, h)
    x1c = jnp.clip(x1, 0, w)
    y1s = y1c // stride
    x1s = x1c // stride

    # row dims of the four sources after _stats_pallas's ">= wr rows,
    # divisible by 8" padding; window starts are aligned down to the
    # sublane tile (8) / lane tile (128) as mosaic requires for sliced
    # DMAs, with the wr = crop + 16 rows / +128 cols absorbing the shift
    wr = crop + 16
    h0 = _round_up(max(h, wr), 8)
    hs = jnp.asarray([h0] + [_round_up(max(_round_half(h, 2 ** l), wr), 8)
                             for l in range(1, _PYR_LEVELS)], jnp.int32)
    wsm, wbg, wps, wpb = _lane_dims(crop, w)

    hs_l = hs[level]
    oy_raw = jnp.where(level == 0, y1c, y1s)
    oy = jnp.clip((oy_raw // 8) * 8, 0, hs_l - wr)
    dya = oy_raw - oy
    nrows = jnp.minimum(crop, (bh + stride - 1) // stride)

    # clip bounds are 128-multiples, so alignment survives the clip; the
    # aligned-down start stays a stride multiple (128 % stride == 0), so
    # the kernel's `col % stride == 0` subsampling mask stays valid.
    xs_big = x1s * stride
    ox_small = jnp.clip((x1c // 128) * 128, 0, wps - wsm)
    ox_big = jnp.clip((xs_big // 128) * 128, 0, wpb - wbg)
    ox = jnp.where(level == 0, ox_small, ox_big)
    dxa = jnp.where(level == 0, x1c, xs_big) - ox
    ncl = stride * jnp.minimum(crop, (bw + stride - 1) // stride)

    rmin_b = jnp.broadcast_to(rmin.astype(jnp.int32), level.shape)
    return jnp.stack([level, oy, ox, dya, nrows, dxa, ncl, stride,
                      rmin_b], axis=1)


def _round_half(h: int, s: int) -> int:
    """rows of x[::s] for an h-row array."""
    return -(-h // s)


def _make_core(crop: int, baseline: float, focal_length: float,
               interpret: bool):
    """Batched core (S, H, W) x (S, B, 4) x (S, B) -> ((S, B), (S, B)),
    wrapped in custom_vmap so outer vmaps fold into the stream axis."""
    bf = baseline * focal_length

    @jax.custom_batching.custom_vmap
    def core(disp, boxes, valid):
        s, h, w = disp.shape
        b = boxes.shape[1]

        # integer validity threshold with the base path's own XLA division
        # semantics; keyed on a runtime zero so XLA cannot constant-fold it
        # with a different (host) evaluator.
        rt0 = (disp[0, 0, 0] * 0.0).astype(jnp.float32)
        rr = jnp.arange(65536, dtype=jnp.float32) + rt0
        dd = bf / (rr / 16.0 + 1e-6)
        vr = (dd > 0.0) & (dd < MAX_DEPTH)
        rmin = jnp.where(jnp.any(vr), jnp.argmax(vr), 65536).astype(
            jnp.int32)

        scal = jax.vmap(lambda bx: _prep_scalars(bx, h, w, crop, rmin))(
            boxes)                                        # (S, B, NS-1)
        sid = jnp.broadcast_to(
            jnp.arange(s, dtype=jnp.int32)[:, None, None], (s, b, 1))
        scal = jnp.concatenate([sid, scal], axis=2).reshape(s * b, _NS)

        stats = _stats_pallas(disp, scal, bf=bf, crop=crop,
                              interpret=interpret)
        stats = stats.reshape(s, b, _NOUT)

        dmap = jax.vmap(lambda d, bx, vl, st: _epilogue(
            d, bx, vl, st, h, w, crop, bf))
        return dmap(disp, boxes, valid, stats)

    @core.def_vmap
    def _rule(axis_size, in_batched, disp, boxes, valid):
        def fold(x, batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        d, sc = core(fold(disp, in_batched[0]), fold(boxes, in_batched[1]),
                     fold(valid, in_batched[2]))
        b = d.shape[-1]
        return ((d.reshape(axis_size, -1, b), sc.reshape(axis_size, -1, b)),
                (True, True))

    return core


def _epilogue(disp, boxes, valid, stats, h: int, w: int, crop: int,
              bf: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact reference arithmetic from per-box stats; single stream.

    Mirrors ops/depth.py:extract_box_depths_disp per_box after the rank
    search (corner votes ocsort_disparity.py:154-167, segment means
    :136-175) on (B,)-sized arrays.
    """
    x1 = boxes[:, 0].astype(jnp.int32)
    y1 = boxes[:, 1].astype(jnp.int32)
    x2 = boxes[:, 2].astype(jnp.int32)
    y2 = boxes[:, 3].astype(jnp.int32)
    bw = x2 - x1
    bh = y2 - y1
    degenerate = ((x1 < 0) | (y1 < 0) | (bw <= 0) | (bh <= 0) |
                  (boxes[:, 0] >= w) | (boxes[:, 1] >= h))
    skip = (jnp.logical_not(valid) | degenerate |
            (bw.astype(jnp.float32) > MAX_BOX_W))

    n = stats[:, 0].astype(jnp.int32)
    r_raw = stats[:, 1:9].astype(jnp.int32)       # [mid, we0..2, ws0..2, fb]
    cnt_lt = stats[:, 9:16].astype(jnp.int32)
    sum_lt = stats[:, 16:23]

    r_vals = _f_depth(r_raw, jnp.float32(bf))
    d_mid = r_vals[:, 0]

    # 2x2 corner means on the full-res map, base clip bounds
    # (pw = w + crop + 2 is the base pyramid buffer width)
    pw = w + crop + 2
    cy1 = jnp.clip(y1, 0, h + crop)
    cy2 = jnp.clip(y2 - 2, 0, h + crop)
    cx1 = jnp.clip(x1, 0, pw - 2)
    cx2 = jnp.clip(x2 - 2, 0, pw - 2)

    def corner(y, x):
        dy = jnp.arange(2, dtype=jnp.int32)[None, :, None]
        dx = jnp.arange(2, dtype=jnp.int32)[None, None, :]
        yy = y[:, None, None] + dy
        xx = x[:, None, None] + dx
        inside = (yy < h) & (xx < w)
        gy = jnp.clip(yy, 0, h - 1)
        gx = jnp.clip(xx, 0, w - 1)
        raw = jnp.round(disp[gy, gx] * 16.0).astype(jnp.int32)
        vals = _f_depth(raw, jnp.float32(bf))
        return jnp.mean(jnp.where(inside, vals, 0.0), axis=(1, 2))

    corners = jnp.stack([corner(cy1, cx1), corner(cy1, cx2),
                         corner(cy2, cx1), corner(cy2, cx2)], axis=1)
    votes = jnp.sum(corners > d_mid[:, None], axis=1)
    branch = jnp.where(votes <= 2, 0, jnp.where(votes == 3, 1, 2))

    nf = n.astype(jnp.float32)
    cand_ws = jnp.stack([(0.4 * nf).astype(jnp.int32),
                         (0.25 * nf).astype(jnp.int32),
                         jnp.zeros_like(n)], axis=1)
    cand_we = jnp.stack([(0.4 * nf + 0.6 * nf).astype(jnp.int32),
                         (0.25 * nf + 0.6 * nf).astype(jnp.int32),
                         (0.6 * nf).astype(jnp.int32)], axis=1)
    m_fb = jnp.maximum(jnp.where(n > 1, n - 1, n), 1)
    ms = jnp.maximum(jnp.concatenate(
        [cand_we, cand_ws, m_fb[:, None]], axis=1), 1)          # (B, 7)
    vs = r_vals[:, 1:]                                          # (B, 7)
    pref = sum_lt + (ms - cnt_lt).astype(jnp.float32) * vs

    bi = jnp.arange(boxes.shape[0])
    ws_b = cand_ws[bi, branch]
    we_b = cand_we[bi, branch]
    seg_cnt = (we_b - ws_b).astype(jnp.float32)
    seg_sum = (jnp.where(we_b > ws_b, pref[bi, branch], 0.0) -
               jnp.where(ws_b > 0, pref[bi, 3 + branch], 0.0))
    fb_cnt = jnp.maximum(n - 1, 1).astype(jnp.float32)
    fb_sum = pref[:, 6]
    use_fb = we_b <= ws_b
    d = jnp.where(use_fb, fb_sum / fb_cnt,
                  seg_sum / jnp.maximum(seg_cnt, 1.0))
    bad = skip | (n < 1)
    d = jnp.where(bad, -1.0, d)
    scale = jnp.where(bad, 1.0, jnp.clip(d * d, 1.0, 3.0))
    return d, scale


@functools.lru_cache(maxsize=None)
def _cached_core(crop: int, baseline: float, focal_length: float,
                 interpret: bool):
    return _make_core(crop, baseline, focal_length, interpret)


def extract_box_depths_disp_pallas(disp: jnp.ndarray, bboxes: jnp.ndarray,
                                   valid: jnp.ndarray, baseline: float,
                                   focal_length: float, crop: int = 128,
                                   interpret: bool = None,
                                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``ops.depth.extract_box_depths_disp`` (same contract:
    fixed-point disparity in, per-box corner-guided depth + depth^2 scale
    out), evaluated by the fused pallas kernel.  vmap folds into the
    kernel's stream axis.  Integer-domain outputs are bit-identical to the
    base path; final depths may differ by f32 sum-reassociation ULPs (see
    module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    # crop % 16 == 0 keeps the pyramid-window lane width 8*crop a
    # multiple of the 128 lane tile (_lane_dims); crop <= 128 because the
    # in-kernel column compaction lands on one 128-lane tile
    assert crop % 16 == 0 and 16 <= crop <= 128, crop
    core = _cached_core(int(crop), float(baseline), float(focal_length),
                        bool(interpret))
    d, sc = core(disp[None], bboxes[None], valid[None])
    return d[0], sc[0]
