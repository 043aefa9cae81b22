"""Fused Pallas TPU kernel for the dual CSPDarknet stage 1.

Why this exists: after the pallas Focus stems, stage 1 is the single
biggest slice of the serving step (7.2 ms of the 32.7 ms 8-stream step on
v5e, ~12% of bf16 peak).  The XLA W-folded evaluation is sound per-op but
structurally can't fuse ACROSS the chain: every CSP intermediate (conv
output, main/short 1x1s, bottleneck convs, concat, final 1x1 — ~2.5 GB per
8-stream step at 1080p) round-trips HBM, and the stride-2 entry conv's
remapped kernel carries dead lanes XLA multiplies anyway.  The recorded
conv roofline (ARCHITECTURE.md round-4 table) shows the 1x1-dominated CSP
work is HBM-bound — the fix is cross-chain fusion, not faster dots.

This kernel evaluates the ENTIRE dual stage 1 — both branches' stride-2
conv + CSP layer (main/short 1x1, one Darknet bottleneck, concat-equivalent
final 1x1) + the (rgb + disp)/2 fusion of
``CSPDarknetDual`` (reference behavior
/root/reference/mmtrack/models/backbones/csp_darknet_disparity_v1.py:155-206)
— in one pass over row bands, keeping every intermediate in VMEM.  All
matmuls are (M, 4C)@(4C, 2O) full-lane MXU dots built from EXACT remaps of
the canonical parameter tree (the same algebra as models/layers.py's folded
kernels, re-split so each dot is dense):

- input: the stems' space_to_depth(2) activations (H/4, W/2·2, 4C).  Each
  row splits into even/odd stride-2 cells E/O; the entry conv becomes
  6 dense dots per band: for row taps gy in {0,1} and column sources
  {E[j], O[j], O[j-1]} (the five (u, kx) tap classes of the W-folded
  stride-2 conv partition exactly into these three shifted views).
  The E/O split itself happens OUTSIDE the kernel as one XLA relayout:
  Mosaic lowers an in-kernel sublane-stride-2 select to per-element
  copies (73.2 ms vs 1.6 ms per 8-stream 1080p step, measured in
  tools/probe_stage1_variants.py — vs 7.4 ms for the op-by-op XLA
  stage).  Cell shifts are zero-fill concats (slice + concat beats a
  f32-cast ``pltpu.roll`` ~6x here; Mosaic's rotate is 32-bit-only).
- the two branches' 32-channel bottleneck convs are DUAL-STACKED: one
  (M, 128) tensor carries [rgb | disp] halves and block-diagonal kernels
  evaluate both branches per MXU pass (a lone 64-lane dot wastes half the
  array; the stack makes the conv1/conv2 dots dense).
- BN folds into per-lane scale/bias (f32), SiLU in f32, one bf16 rounding
  per ConvBNAct — at least as precise as the XLA bf16 path.

Output: stage-1 activations W-folded (H/4, W/4, 2O), channel ``u*O + o`` —
exactly what the folded stage-2 path (``fold_in=True``) consumes.

Exactness: pure relayout of canonical parameters (converted torch
checkpoints drop in unchanged); equivalence vs the XLA folded path is
pinned by tests/test_stage1_pallas.py, including the full per-frame
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

# ky -> (gy, py): 3x3 stride-2 row tap ky reads canonical row 2r-1+ky =
# s2d(2) cell r-1+gy, sub-row py (same algebra as stage_kernel_to_s2d2).
_KY_MAP = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
# (src, u, kx, px): column tap kx of output parity u reads canonical col
# 4j+2u+kx-1 = cell 2j + floor(e/2) (e = 2u+kx-1), sub-col px = e mod 2.
# src 0 = even cell E[j], 1 = odd cell O[j], 2 = shifted odd cell O[j-1].
_COL_ENTRIES = (
    (0, 0, 1, 0), (0, 0, 2, 1), (0, 1, 0, 1),   # E
    (1, 1, 1, 0), (1, 1, 2, 1),                 # O
    (2, 0, 0, 1),                               # O[j-1]
)


def _conv_split_mats(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) stride-2 kernel -> (2, 3, 4C, 2O) dense GEMM mats
    [gy, src] over s2d(2)-channel input (p = py*2+px) and W-folded output
    (u*O + o)."""
    c, o = w.shape[2], w.shape[3]
    m = jnp.zeros((2, 3, 4 * c, 2 * o), w.dtype)
    for ky in range(3):
        gy, py = _KY_MAP[ky]
        for src, u, kx, px in _COL_ENTRIES:
            p = py * 2 + px
            m = m.at[gy, src, p * c:(p + 1) * c, u * o:(u + 1) * o].set(
                w[ky, kx])
    return m


def _sb(bn_p, bn_s, eps: float, rep: int) -> jnp.ndarray:
    """Folded inference BN as (2, rep*O) [scale; bias], tiled over the
    ``rep`` fold parities (folded channel u*O + o)."""
    inv = bn_p['scale'] / jnp.sqrt(bn_s['var'] + eps)
    return jnp.stack([jnp.tile(inv, rep),
                      jnp.tile(bn_p['bias'] - bn_s['mean'] * inv, rep)])


class Stage1Weights(NamedTuple):
    """Dense GEMM remaps of the canonical stage1/disp_stage1 parameters."""
    conv: jnp.ndarray      # (2, 2, 3, 4C, 2O)  [branch, gy, src]
    ms: jnp.ndarray        # (2, 2O, 4m)        main|short combined 1x1
    c1: jnp.ndarray        # (4m, 4m)           dual block-diag bottleneck 1x1
    c2: jnp.ndarray        # (3, 3, 4m, 4m)     dual block-diag folded 3x3
    fin: jnp.ndarray       # (2, 2, 4m, 2O)     [branch, {from blk, from short}]
    conv_sb: jnp.ndarray   # (2, 2, 2O)
    ms_sb: jnp.ndarray     # (2, 2, 4m)
    c1_sb: jnp.ndarray     # (2, 4m)
    c2_sb: jnp.ndarray     # (2, 4m)
    fin_sb: jnp.ndarray    # (2, 2, 2O)


def stage1_fused_weights(backbone_params, backbone_stats,
                         eps: float = BN_EPS) -> Stage1Weights:
    """Build the kernel's dense weight set from the CANONICAL CSPDarknetDual
    tree ('stage1'/'disp_stage1': conv + csp{main,short,blocks_0,final})."""
    names = ('stage1', 'disp_stage1')
    for n in names:
        csp = backbone_params[n]['csp']
        if 'blocks_1' in csp:
            raise ValueError('stage1 pallas kernel supports num_blocks == 1 '
                             '(deepen_factor <= 0.33); fall back to the XLA '
                             'stage-1 path for deeper variants')

    def conv_kernel(p, path):
        node = p
        for k in path:
            node = node[k]
        return node['conv']['kernel']

    def bn(pp, ss, path):
        np_, ns = pp, ss
        for k in path:
            np_, ns = np_[k], ns[k]
        return np_['bn'], ns['bn']

    convs, conv_sbs, mss, ms_sbs, fins, fin_sbs = [], [], [], [], [], []
    c1_blocks, c1_sbs, c2_blocks, c2_sbs = [], [], [], []
    mid = None
    for n in names:
        p, s = backbone_params[n], backbone_stats[n]
        w = conv_kernel(p, ('conv',))                      # (3, 3, C, O)
        convs.append(_conv_split_mats(w))
        conv_sbs.append(_sb(*bn(p, s, ('conv',)), eps, 2))

        wm = conv_kernel(p, ('csp', 'main_conv'))          # (1, 1, O, m)
        ws = conv_kernel(p, ('csp', 'short_conv'))
        mid = wm.shape[-1]
        wm_f = conv1x1_kernel_folded(wm)[0, 0]             # (2O, 2m)
        ws_f = conv1x1_kernel_folded(ws)[0, 0]
        mss.append(jnp.concatenate([wm_f, ws_f], axis=1))  # (2O, 4m)
        ms_sbs.append(jnp.concatenate(
            [_sb(*bn(p, s, ('csp', 'main_conv')), eps, 2),
             _sb(*bn(p, s, ('csp', 'short_conv')), eps, 2)], axis=1))

        w1 = conv_kernel(p, ('csp', 'blocks_0', 'conv1'))  # (1, 1, m, m)
        c1_blocks.append(conv1x1_kernel_folded(w1)[0, 0])  # (2m, 2m)
        c1_sbs.append(_sb(*bn(p, s, ('csp', 'blocks_0', 'conv1')), eps, 2))
        w2 = conv_kernel(p, ('csp', 'blocks_0', 'conv2'))  # (3, 3, m, m)
        c2_blocks.append(conv3x3_kernel_folded(w2))        # (3, 3, 2m, 2m)
        c2_sbs.append(_sb(*bn(p, s, ('csp', 'blocks_0', 'conv2')), eps, 2))

        wf = conv_kernel(p, ('csp', 'final_conv'))         # (1, 1, 2m, O)
        wf_f = concat1x1_kernel_folded(wf, mid)[0, 0]      # (4m, 2O)
        fins.append(wf_f)
        fin_sbs.append(_sb(*bn(p, s, ('csp', 'final_conv')), eps, 2))

    m2 = 2 * mid
    o2 = fins[0].shape[-1]

    def block_diag(a, b):
        z = jnp.zeros((a.shape[0] + b.shape[0],
                       a.shape[1] + b.shape[1]), a.dtype)
        z = z.at[:a.shape[0], :a.shape[1]].set(a)
        return z.at[a.shape[0]:, a.shape[1]:].set(b)

    c2 = jnp.stack([jnp.stack([
        block_diag(c2_blocks[0][ky, gx], c2_blocks[1][ky, gx])
        for gx in range(3)]) for ky in range(3)])

    # final conv reads [blk | short] per branch out of the dual-stacked
    # block tensor (rgb lanes [0, 2m), disp [2m, 4m)) and the per-branch
    # [main | short] tensor (short lanes [2m, 4m)).
    fin = jnp.zeros((2, 2, 2 * m2, o2), fins[0].dtype)
    fin = fin.at[0, 0, :m2].set(fins[0][:m2])
    fin = fin.at[0, 1, m2:].set(fins[0][m2:])
    fin = fin.at[1, 0, m2:].set(fins[1][:m2])
    fin = fin.at[1, 1, m2:].set(fins[1][m2:])

    return Stage1Weights(
        conv=jnp.stack(convs), ms=jnp.stack(mss),
        c1=block_diag(c1_blocks[0], c1_blocks[1]), c2=c2, fin=fin,
        conv_sb=jnp.stack(conv_sbs).astype(jnp.float32),
        ms_sb=jnp.stack(ms_sbs).astype(jnp.float32),
        c1_sb=jnp.concatenate(c1_sbs, axis=1).astype(jnp.float32),
        c2_sb=jnp.concatenate(c2_sbs, axis=1).astype(jnp.float32),
        fin_sb=jnp.stack(fin_sbs).astype(jnp.float32))


def _act(acc, sb):
    """Folded BN + SiLU in f32, one bf16 rounding (ConvBNAct tail)."""
    y = acc * sb[0][None, :] + sb[1][None, :]
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)


def _shift_down(x, n: int):
    """out[i] = x[i - n], zero-filled at the top.  Static slice + concat:
    Mosaic's rotate op (what ``pltpu.roll`` lowers to) only supports
    32-bit element types, so bf16 row/cell shifts must avoid it; the
    shifted-in rows are masked or sit in the halo margin anyway."""
    return jnp.concatenate(
        [jnp.zeros((n, x.shape[1]), x.dtype), x[:-n]], axis=0)


def _shift_up(x, n: int):
    """out[i] = x[i + n], zero-filled at the bottom (see _shift_down)."""
    return jnp.concatenate(
        [x[n:], jnp.zeros((n, x.shape[1]), x.dtype)], axis=0)


def _stage1_kernel(pre_er, main_er, post_er, pre_or, main_or, post_or,
                   pre_ed, main_ed, post_ed, pre_od, main_od, post_od,
                   wconv, wms, wc1, wc2, wfin,
                   sbconv, sbms, sbc1, sbc2, sbfin, out_ref,
                   *, B: int, W2: int, NB: int):
    j = pl.program_id(0)
    # load the (small) weight blocks once; values index freely below
    wconv, wms, wc1, wc2, wfin = (wconv[...], wms[...], wc1[...], wc2[...],
                                  wfin[...])
    sbconv, sbms, sbc1, sbc2, sbfin = (sbconv[...], sbms[...], sbc1[...],
                                       sbc2[...], sbfin[...])
    o2 = wconv.shape[-1]
    m4 = wc1.shape[0]
    h = m4 // 2
    M2 = (B + 2) * W2       # conv/main/short/conv1 rows (1-row halo each side)
    M3 = B * W2             # conv2/final/output rows
    f32 = jnp.float32

    iota = jax.lax.broadcasted_iota(jnp.int32, ((B + 3) * W2, 1), 0)
    not_first_col = (iota % W2) != 0

    def edges(pre, main, post):
        # stem rows [B*j - 2, B*j + B + 1); rows beyond the image are the
        # entry conv's zero padding (the pre/post blocks arrive index-
        # clamped, so zero them explicitly at the edges of the grid).
        return jnp.concatenate([
            jnp.where(j == 0, 0, pre[...]),
            main[...],
            jnp.where(j == NB - 1, 0, post[...]),
        ], axis=0).reshape((B + 3) * W2, pre.shape[-1])

    def branch(pre_e, main_e, post_e, pre_o, main_o, post_o, bi):
        # even/odd stride-2 cells arrive PRE-SPLIT (the caller's XLA
        # deinterleave): Mosaic lowers an in-kernel sublane-stride-2
        # select catastrophically (73.2 ms vs 1.6 ms per 8-stream step,
        # tools/probe_stage1_variants.py on v5e).
        e = edges(pre_e, main_e, post_e)
        o = edges(pre_o, main_o, post_o)
        osh = jnp.where(not_first_col, _shift_down(o, 1), 0)  # O[j-1], 0-pad
        acc = jnp.zeros((M2, o2), f32)
        for gy in range(2):
            sl = slice(gy * W2, gy * W2 + M2)
            for src, wsrc in ((e, 0), (o, 1), (osh, 2)):
                acc += jnp.dot(src[sl], wconv[bi, gy, wsrc],
                               preferred_element_type=f32)
        z = _act(acc, sbconv[bi])
        # main|short combined 1x1 (lanes [main fold | short fold])
        return _act(jnp.dot(z, wms[bi], preferred_element_type=f32),
                    sbms[bi])

    ms_r = branch(pre_er, main_er, post_er, pre_or, main_or, post_or, 0)
    ms_d = branch(pre_ed, main_ed, post_ed, pre_od, main_od, post_od, 1)

    # dual-stacked bottleneck: [main_rgb | main_disp] through block-diagonal
    # conv1/conv2 — both branches' 64-lane convs share each MXU pass.
    maind = jnp.concatenate([ms_r[:, :h], ms_d[:, :h]], axis=1)
    c1 = _act(jnp.dot(maind, wc1, preferred_element_type=f32), sbc1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (M2, 1), 0)
    edge = (((j == 0) & (rowid < W2))
            | ((j == NB - 1) & (rowid >= (B + 1) * W2)))
    c1 = jnp.where(edge, 0, c1)                  # conv2's SAME zero rows
    c1p = jnp.where((rowid % W2) != 0, _shift_down(c1, 1), 0)
    c1m = jnp.where((rowid % W2) != W2 - 1, _shift_up(c1, 1), 0)
    srcs = (c1p, c1, c1m)                        # folded col taps j-1, j, j+1
    acc2 = jnp.zeros((M3, m4), f32)
    for ky in range(3):
        sl = slice(ky * W2, ky * W2 + M3)
        for gx in range(3):
            acc2 += jnp.dot(srcs[gx][sl], wc2[ky, gx],
                            preferred_element_type=f32)
    blk = _act(acc2, sbc2) + maind[W2:W2 + M3]   # bottleneck residual

    fr = _act(jnp.dot(blk, wfin[0, 0], preferred_element_type=f32)
              + jnp.dot(ms_r[W2:W2 + M3], wfin[0, 1],
                        preferred_element_type=f32), sbfin[0])
    fd = _act(jnp.dot(blk, wfin[1, 0], preferred_element_type=f32)
              + jnp.dot(ms_d[W2:W2 + M3], wfin[1, 1],
                        preferred_element_type=f32), sbfin[1])
    y = (fr.astype(f32) + fd.astype(f32)) * 0.5  # branch average
    out_ref[...] = y.astype(jnp.bfloat16).reshape(B, W2, o2)


@functools.partial(jax.jit, static_argnames=('interpret', 'band'))
def stage1_dual_pallas(stem_rgb: jnp.ndarray, stem_dsp: jnp.ndarray,
                       wts: Stage1Weights, interpret: bool = False,
                       band: int = 4) -> jnp.ndarray:
    """Fused dual stage 1: s2d(2) stem activations (H4, 2*W2, 4C) for both
    branches -> W-folded fused stage-1 output (H4, W2, 2O) bf16."""
    H4, W4, _ = stem_rgb.shape
    assert stem_dsp.shape == stem_rgb.shape
    W2 = W4 // 2
    assert W4 % 2 == 0
    B = band
    while B > 2 and (H4 % B or B % 2):
        B -= 2
    assert B >= 2 and H4 % B == 0 and B % 2 == 0, (H4, band)
    NB = H4 // B
    o2 = wts.conv.shape[-1]
    bf16 = jnp.bfloat16

    # split even/odd stride-2 cells OUTSIDE the kernel: one cheap XLA
    # relayout per branch instead of a Mosaic sublane-stride-2 select per
    # band (73.2 -> 1.6 ms per 8-stream 1080p step on v5e, bit-identical —
    # tools/probe_stage1_variants.py)
    def deint(x):
        v = x.reshape(H4, W2, 2, x.shape[-1])
        return v[:, :, 0], v[:, :, 1]

    e_r, o_r = deint(stem_rgb)
    e_d, o_d = deint(stem_dsp)

    def xspecs(shape):
        return [
            pl.BlockSpec((2,) + shape[1:],
                         lambda jj: (jnp.maximum(jj * (B // 2) - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B,) + shape[1:],
                         lambda jj: (jj, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + shape[1:],
                         lambda jj: (jnp.minimum(jj * B + B, H4 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
    kern = functools.partial(_stage1_kernel, B=B, W2=W2, NB=NB)
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=(xspecs(e_r.shape) + xspecs(o_r.shape)
                  + xspecs(e_d.shape) + xspecs(o_d.shape) + wspecs),
        out_specs=pl.BlockSpec((B, W2, o2), lambda jj: (jj, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H4, W2, o2), bf16),
        interpret=interpret,
        # the per-band chain holds ~30 live (M2, 128)-scale temporaries
        # (concat-shift copies, f32 accumulators); Mosaic's default 16 MiB
        # scoped-vmem stack is too small at 1080p bands — v5e has 128 MiB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(e_r, e_r, e_r, o_r, o_r, o_r, e_d, e_d, e_d, o_d, o_d, o_d,
      wts.conv.astype(bf16), wts.ms.astype(bf16), wts.c1.astype(bf16),
      wts.c2.astype(bf16), wts.fin.astype(bf16),
      wts.conv_sb, wts.ms_sb, wts.c1_sb, wts.c2_sb, wts.fin_sb)


def pallas_stage1_out(backbone_params, backbone_stats, stem_out,
                      disp_stem_out, eps: float = BN_EPS,
                      interpret: bool = False, band: int = 4) -> jnp.ndarray:
    """Fused stage-1 output from the CANONICAL backbone tree + the pallas
    stems' s2d(2) activations; feeds CSPDarknetDual's ``stage1_out`` entry
    (the folded stage-2 ``fold_in`` path)."""
    wts = stage1_fused_weights(backbone_params, backbone_stats, eps)
    return stage1_dual_pallas(stem_out, disp_stem_out, wts,
                              interpret=interpret, band=band)
