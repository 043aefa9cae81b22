"""Fused Pallas TPU kernel for backbone stage 2 (entry conv + CSP chain).

Why this exists: with the stems (ops/stem_pallas.py) and the dual stage 1
(ops/stage1_pallas.py) fused, stage 2 is the biggest remaining XLA slice of
the serving step.  The recorded conv roofline (ARCHITECTURE.md round-4
table) shows its 1x1-dominated CSP work is HBM-bound — every intermediate
(entry conv out, main/short 1x1s, three bottleneck conv pairs, final 1x1;
~8.4 MB each per 1080p frame, ~67 MB per 8-stream step EACH) round-trips
HBM under XLA, which cannot fuse across conv boundaries.  Same fix as
stage 1: evaluate the whole chain per row band with every intermediate in
VMEM, all matmuls dense full-lane MXU dots from EXACT remaps of the
canonical parameter tree.

Layout contract (reference stage behavior
/root/reference/mmtrack/models/backbones/csp_darknet_disparity_v1.py:94-154,
mmdet CSPLayer expand_ratio=0.5):

- input: the fused stage-1 output, W-folded ``(H4, W2, 2C)`` with channel
  ``u*C + c`` for actual column ``2j + u`` — exactly what
  ``stage1_dual_pallas`` emits.
- the stride-2 entry conv decomposes over this grid into 9 dense
  (2C, 2O) GEMMs indexed by (row view, column view): output row r reads
  input rows {2r-1, 2r, 2r+1} (odd-prev / even / odd views of the raw
  row axis) and folded output column (k, v) reads input cells
  {2k-1, 2k, 2k+1} (prev-odd / even / odd cell views).
- the CSP runs W-folded at the output grid (cell k, parity v in lanes):
  main/short as one combined (2O, 4m) dot, each DarknetBottleneck as a
  folded 1x1 dot + a 9-dot folded 3x3 (``conv3x3_kernel_folded``) with
  row taps as sublane rolls and column taps as single-cell rolls, plus
  the residual; the final conv reads the [main-fold | short-fold] lane
  layout directly (``concat1x1_kernel_folded`` — no permute).
- output: stage-2 activations W-folded ``(H8, W4, 2O)``, channel
  ``v*O + o`` — stage 3 consumes this with its ``fold_consume`` entry
  conv (an existing, tested remap); the neck's C3 tap unfolds with one
  reshape.

Band halos: each of the ``nb`` bottleneck 3x3s consumes one output-row
halo, so a band of B output rows evaluates the entry conv over B + 2*nb
rows; garbage rows at band edges stay inside the shrinking margin and
image-boundary rows are zero-masked before every 3x3 (SAME padding).

The four (row parity, cell parity) interleaves of the stage-1 grid are
split OUTSIDE the kernel as one XLA relayout; Mosaic lowers in-kernel
sublane-stride-2 selects (and per-row concat gathers) to per-element
copies — the same pathology measured at 73.2 -> 1.6 ms on the stage-1
kernel (tools/probe_stage1_variants.py, real v5e).

Exactness: pure relayout of canonical parameters (converted torch
checkpoints drop in unchanged); equivalence vs the XLA folded path is
pinned by tests/test_stage2_pallas.py, including the full per-frame
program.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import (BN_EPS, concat1x1_kernel_folded,
                             conv1x1_kernel_folded, conv3x3_kernel_folded)
from .stage1_pallas import _act, _sb, _shift_down, _shift_up

# entry conv tap algebra: output (cell k, parity v) at row r reads actual
# input (row 2r + ky - 1, col 4k + 2v + kx - 1).  Rows split into three
# views by ky (0 = odd row 2r-1, 1 = even row 2r, 2 = odd row 2r+1); cols
# into three cell views cv (0 = prev odd cell 2k-1, 1 = even cell 2k,
# 2 = odd cell 2k+1) with within-cell parity u:
#   (v, kx) -> (cv, u)
_ENTRY_COLS = {
    (0, 0): (0, 1), (0, 1): (1, 0), (0, 2): (1, 1),
    (1, 0): (1, 1), (1, 1): (2, 0), (1, 2): (2, 1),
}


def _entry_split_mats(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) stride-2 kernel -> (3, 3, 2C, 2O) dense GEMM mats
    [ky (row view), cv (col view)] over W-folded input (lane u*C + c) and
    W-folded output (lane v*O + o)."""
    c, o = w.shape[2], w.shape[3]
    m = jnp.zeros((3, 3, 2 * c, 2 * o), w.dtype)
    for ky in range(3):
        for v in range(2):
            for kx in range(3):
                cv, u = _ENTRY_COLS[(v, kx)]
                m = m.at[ky, cv, u * c:(u + 1) * c, v * o:(v + 1) * o].set(
                    w[ky, kx])
    return m


class Stage2Weights(NamedTuple):
    """Dense GEMM remaps of the canonical ``stage2`` parameters."""
    entry: jnp.ndarray     # (3, 3, 2C, 2O)   [ky, cv]
    ms: jnp.ndarray        # (2O, 4m)         main|short combined 1x1
    c1: jnp.ndarray        # (nb, 2m, 2m)     folded bottleneck 1x1s
    c2: jnp.ndarray        # (nb, 3, 3, 2m, 2m)  folded bottleneck 3x3s
    fin: jnp.ndarray       # (2, 2m, 2O)      [{from blk, from short}]
    entry_sb: jnp.ndarray  # (2, 2O)
    ms_sb: jnp.ndarray     # (2, 4m)
    c1_sb: jnp.ndarray     # (nb, 2, 2m)
    c2_sb: jnp.ndarray     # (nb, 2, 2m)
    fin_sb: jnp.ndarray    # (2, 2O)


def stage2_fused_weights(backbone_params, backbone_stats,
                         stage: str = 'stage2',
                         eps: float = BN_EPS) -> Stage2Weights:
    """Build the kernel's dense weight set from the CANONICAL backbone
    tree (``stage2``: conv + csp{main,short,blocks_i,final})."""
    p, s = backbone_params[stage], backbone_stats[stage]

    def conv_kernel(path):
        node = p
        for k in path:
            node = node[k]
        return node['conv']['kernel']

    def bn(path):
        np_, ns = p, s
        for k in path:
            np_, ns = np_[k], ns[k]
        return np_['bn'], ns['bn']

    w = conv_kernel(('conv',))                         # (3, 3, C, O)
    entry = _entry_split_mats(w)
    entry_sb = _sb(*bn(('conv',)), eps, 2)

    wm = conv_kernel(('csp', 'main_conv'))             # (1, 1, O, m)
    ws = conv_kernel(('csp', 'short_conv'))
    mid = wm.shape[-1]
    ms = jnp.concatenate([conv1x1_kernel_folded(wm)[0, 0],
                          conv1x1_kernel_folded(ws)[0, 0]], axis=1)
    ms_sb = jnp.concatenate([_sb(*bn(('csp', 'main_conv')), eps, 2),
                             _sb(*bn(('csp', 'short_conv')), eps, 2)],
                            axis=1)

    c1s, c1_sbs, c2s, c2_sbs = [], [], [], []
    i = 0
    while f'blocks_{i}' in p['csp']:
        blk = ('csp', f'blocks_{i}')
        c1s.append(conv1x1_kernel_folded(conv_kernel(blk + ('conv1',)))[0, 0])
        c1_sbs.append(_sb(*bn(blk + ('conv1',)), eps, 2))
        c2s.append(conv3x3_kernel_folded(conv_kernel(blk + ('conv2',))))
        c2_sbs.append(_sb(*bn(blk + ('conv2',)), eps, 2))
        i += 1

    wf = conv_kernel(('csp', 'final_conv'))            # (1, 1, 2m, O)
    wf_f = concat1x1_kernel_folded(wf, mid)[0, 0]      # (4m, 2O)
    m2 = 2 * mid
    fin = jnp.stack([wf_f[:m2], wf_f[m2:]])            # blk part, short part
    fin_sb = _sb(*bn(('csp', 'final_conv')), eps, 2)

    f32 = jnp.float32
    return Stage2Weights(
        entry=entry, ms=ms, c1=jnp.stack(c1s), c2=jnp.stack(c2s), fin=fin,
        entry_sb=entry_sb.astype(f32), ms_sb=ms_sb.astype(f32),
        c1_sb=jnp.stack(c1_sbs).astype(f32),
        c2_sb=jnp.stack(c2_sbs).astype(f32), fin_sb=fin_sb.astype(f32))


def _stage2_kernel(pre_ee, main_ee, post_ee, pre_eo, main_eo, post_eo,
                   pre_oe, main_oe, post_oe, pre_oo, main_oo, post_oo,
                   went, wms, wc1, wc2, wfin,
                   sbent, sbms, sbc1, sbc2, sbfin, out_ref,
                   *, B: int, W4: int, EXT: int, H8: int, NB: int):
    j = pl.program_id(0)
    went, wms, wc1, wc2, wfin = (went[...], wms[...], wc1[...], wc2[...],
                                 wfin[...])
    sbent, sbms, sbc1, sbc2, sbfin = (sbent[...], sbms[...], sbc1[...],
                                      sbc2[...], sbfin[...])
    o2 = went.shape[-1]
    m2 = wc1.shape[-1]
    nb = wc1.shape[0]
    Bx = B + 2 * EXT        # entry/CSP rows evaluated per band
    M2 = Bx * W4
    f32 = jnp.float32
    H4 = 2 * H8

    # the four (row parity, cell parity) interleaves of the stage-1 grid
    # arrive PRE-SPLIT from the caller's XLA relayout (see
    # stage2_fold_pallas); each as pre/main/post blocks of B H8-rows
    # covering [B*j - B, B*j + 2B), index-clamped at the grid edges.
    # Every view below is zero-masked by its INTENDED absolute row, so
    # clamped duplicates never contribute.  Requires B >= EXT + 1.
    def band(pre, main, post):
        return jnp.concatenate(
            [pre[...], main[...], post[...]], axis=0).reshape(
                3 * B * W4, pre.shape[-1])

    ee = band(pre_ee, main_ee, post_ee)     # even rows, even cells
    eo = band(pre_eo, main_eo, post_eo)     # even rows, odd cells
    oe = band(pre_oe, main_oe, post_oe)     # odd rows,  even cells
    oo = band(pre_oo, main_oo, post_oo)     # odd rows,  odd cells

    iota2 = jax.lax.broadcasted_iota(jnp.int32, (M2, 1), 0)
    l_of = iota2 // W4                      # entry-local row l in [0, Bx)
    cell = iota2 % W4
    r_abs = B * j + l_of - EXT              # absolute stage-2 output row
    not_first = cell != 0
    not_last = cell != W4 - 1

    def view(rows_e, rows_o, a):
        """(M2, C) slice of a split band starting at local row B + a."""
        off = (B + a) * W4
        return rows_e[off:off + M2], rows_o[off:off + M2]

    # intended absolute raw rows: ky=1 even 2r, ky=2 odd 2r+1, ky=0 odd 2r-1
    views = {
        1: (view(ee, eo, -EXT), 2 * r_abs),
        2: (view(oe, oo, -EXT), 2 * r_abs + 1),
        0: (view(oe, oo, -EXT - 1), 2 * r_abs - 1),
    }

    acc = jnp.zeros((M2, o2), f32)
    for ky, ((ve, vo), raw_row) in views.items():
        ok = (raw_row >= 0) & (raw_row < H4)
        ce = jnp.where(ok, ve, 0)                  # even cells 2k
        co = jnp.where(ok, vo, 0)                  # odd cells 2k+1
        cp = jnp.where(not_first, _shift_down(co, 1), 0)
        for cv, src in ((0, cp), (1, ce), (2, co)):
            acc += jnp.dot(src, went[ky, cv], preferred_element_type=f32)
    z = _act(acc, sbent)                           # (M2, 2O)

    ms = _act(jnp.dot(z, wms, preferred_element_type=f32), sbms)
    m = ms[:, :m2]                                 # main fold
    row_ok = (r_abs >= 0) & (r_abs < H8)
    for i in range(nb):
        c1 = _act(jnp.dot(m, wc1[i], preferred_element_type=f32), sbc1[i])
        c1 = jnp.where(row_ok, c1, 0)              # conv2 SAME zero rows
        c1p = jnp.where(not_first, _shift_down(c1, 1), 0)
        c1m = jnp.where(not_last, _shift_up(c1, 1), 0)
        srcs = (c1p, c1, c1m)                      # folded col taps k-1,k,k+1
        acc2 = jnp.zeros((M2, m2), f32)
        for ky in range(3):
            # row tap r + ky - 1 as a band roll: wrap garbage stays inside
            # the shrinking halo margin
            for gx in range(3):
                t = srcs[gx]
                if ky == 0:
                    t = _shift_down(t, W4)
                elif ky == 2:
                    t = _shift_up(t, W4)
                acc2 += jnp.dot(t, wc2[i, ky, gx], preferred_element_type=f32)
        m = _act(acc2, sbc2[i]) + m                # bottleneck residual

    y = _act(jnp.dot(m, wfin[0], preferred_element_type=f32)
             + jnp.dot(ms[:, m2:], wfin[1], preferred_element_type=f32),
             sbfin)
    out_ref[...] = y[EXT * W4:(EXT + B) * W4].reshape(B, W4, o2)


@functools.partial(jax.jit, static_argnames=('interpret', 'band'))
def stage2_fold_pallas(stage1_out: jnp.ndarray, wts: Stage2Weights,
                       interpret: bool = False, band: int = 4) -> jnp.ndarray:
    """Fused stage 2: W-folded stage-1 activations (H4, W2, 2C) ->
    W-folded stage-2 output (H4/2, W2/2, 2O) bf16."""
    H4, W2, _ = stage1_out.shape
    assert H4 % 2 == 0 and W2 % 2 == 0, (H4, W2)
    H8, W4 = H4 // 2, W2 // 2
    nb = wts.c1.shape[0]
    B = band
    while B < H8 and (H8 % B or B < nb + 1):
        B += 1
    # masks need the pre-block to cover row B*j - EXT - 1: B >= EXT + 1
    assert H8 % B == 0 and B >= nb + 1, \
        f'stage2 pallas kernel needs H/8 divisible by a band >= ' \
        f'num_blocks+1 (H8={H8}, band={band}, nb={nb})'
    # bound the escalation: for awkward heights the divisor search could
    # otherwise land on B=H8 (whole image in one band) and silently blow
    # the per-band VMEM working set far past the requested size (ADVICE r4)
    assert B <= 4 * max(band, nb + 1), \
        f'stage2 pallas band search escalated {band} -> {B} (H8={H8} has ' \
        f'no divisor in [{nb + 1}, {4 * max(band, nb + 1)}]); pad the ' \
        f'input height to a friendlier multiple or use stage2_backend=xla'
    NB = H8 // B
    o2 = wts.entry.shape[-1]
    bf16 = jnp.bfloat16

    # split the four (row parity, cell parity) interleaves OUTSIDE the
    # kernel: one XLA relayout instead of Mosaic sublane-stride-2 selects
    # and per-row concat gathers per band (the same pathology measured at
    # 73.2 -> 1.6 ms on stage 1, tools/probe_stage1_variants.py)
    v = stage1_out.reshape(H8, 2, W4, 2, stage1_out.shape[-1])
    xs = [v[:, r, :, c] for r in range(2) for c in range(2)]

    def hspecs(shape):
        return [
            pl.BlockSpec((B,) + shape[1:],
                         lambda jj: (jnp.maximum(jj - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B,) + shape[1:],
                         lambda jj: (jj, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B,) + shape[1:],
                         lambda jj: (jnp.minimum(jj + 1, NB - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    xspecs = sum((hspecs(x.shape) for x in xs), [])
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
    kern = functools.partial(_stage2_kernel, B=B, W4=W4, EXT=nb, H8=H8,
                             NB=NB)
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=xspecs + wspecs,
        out_specs=pl.BlockSpec((B, W4, o2), lambda jj: (jj, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H8, W4, o2), bf16),
        interpret=interpret,
        # see stage1_dual_pallas: concat-shift temporaries overflow the
        # default 16 MiB scoped-vmem stack at 1080p band sizes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*(x for x in xs for _ in range(3)),
      wts.entry.astype(bf16), wts.ms.astype(bf16), wts.c1.astype(bf16),
      wts.c2.astype(bf16), wts.fin.astype(bf16),
      wts.entry_sb, wts.ms_sb, wts.c1_sb, wts.c2_sb, wts.fin_sb)


def pallas_stage2_out(backbone_params, backbone_stats, stage1_out,
                      eps: float = BN_EPS, interpret: bool = False,
                      band: int = 4) -> jnp.ndarray:
    """Fused W-folded stage-2 output from the CANONICAL backbone tree +
    the fused stage-1 kernel's W-folded activations; feeds
    ``CSPDarknetDual``'s ``stage2_out`` entry (stage 3 fold_consume)."""
    wts = stage2_fused_weights(backbone_params, backbone_stats, eps=eps)
    return stage2_fold_pallas(stage1_out, wts, interpret=interpret,
                              band=band)


def pallas_stage3_out(backbone_params, backbone_stats, stage2_out,
                      eps: float = BN_EPS, interpret: bool = False,
                      band: int = 4) -> jnp.ndarray:
    """Fused W-folded stage-3 output.

    Stage 3 has exactly the stage-2 structure one level down (stride-2
    entry conv + CSP chain, no SPP; csp_darknet_disparity_v1.py:94-154) and
    its input is the stage-2 kernel's own W-folded activations, so the
    SAME generic kernel + weight remap run it — only the parameter subtree
    differs (``stage='stage3'``).  Output feeds ``CSPDarknetDual``'s
    ``stage3_out`` entry (stage 4 resumes with its fold_consume conv; the
    neck's C4 tap unfolds with one reshape)."""
    wts = stage2_fused_weights(backbone_params, backbone_stats,
                               stage='stage3', eps=eps)
    return stage2_fold_pallas(stage2_out, wts, interpret=interpret,
                              band=band)


def unfold_w(folded: jnp.ndarray) -> jnp.ndarray:
    """W-folded (..., H, W2, 2C) -> standard (..., H, 2*W2, C): lane
    v*C + c at cell k is actual column 2k + v (one XLA reshape)."""
    *lead, h, w2, c2 = folded.shape
    c = c2 // 2
    return folded.reshape(*lead, h, w2, 2, c).reshape(*lead, h, 2 * w2, c)
