"""Pallas TPU kernel for the Focus stem (raw image -> s2d(2)-layout stem
activation, BN+SiLU fused) operating on a host-packed patch layout.

Why this exists: the canonical Focus stem is a 6x6 stride-2 conv on a
3-channel image (mmdet ``Focus`` semantics; reference backbone
/root/reference/mmtrack/models/backbones/csp_darknet_disparity_v1.py:66-206
uses it via the stem ConvModule).  At 1080p this conv is the single worst
XLA op in the pipeline: the 3-channel minor dim pads to the 128-lane tile
and every XLA formulation measured on v5e (raw 6x6, s2d(4)-remap 3x3,
W-folded (8,3) strided kernel, channel-major pre-transpose) runs 5.5-24 ms
per 8-stream batch, 8-40x off the memory floor.  XLA's minor-dim
transposes are the pathological op; pallas can't fix them in-VMEM either
(mosaic has no lane-granular shuffles).  The fix is a LAYOUT CONTRACT with
the data loader: the host packs each frame once (a cheap strided copy, see
``stem_pack_host``) such that on device every output row's whole im2col
patch matrix is a contiguous, sublane-aligned slice — zero shuffles, one
MXU dot per row, folded BN + SiLU in f32.  Measured v5e: both stems
24.2 ms -> ~5 ms per 8-stream step, which is the HBM floor of the stem
activation write (the dots are fully overlapped).

Packed layout (``stem_pack_host``): the image padded by 2 on every edge is
stored as (H/4 + 1, 8C, WQ) where row ``[g, r*2C + s'*C//2 ...]`` — see
the function docstring for the exact index map; the defining property is
that padded pixel (4g + r, 4q + s', c) lives at ``[g, r*4C + s'*C + c,
q]``.  For output row j the patch rows [48j, 48j+96) (C=3) are exactly
the 96 (t, s', c) taps of the h=0 window half; the h=1 half (cells q+1)
is obtained by lane-rolling the second dot's f32 result by -1.

Output: stem activation in space_to_depth(., 2) layout, (H/4, W/4, 4*O)
with channel ``(py*2+px)*O + o`` — exactly what the folded stage-1 path
consumes.

Exactness: the packed kernel is a pure relayout of the canonical Focus
parameters (structural zeros only where a tap falls outside the 6x6
support), so converted torch checkpoints drop in unchanged; equivalence
vs the canonical path is pinned by tests/test_stem_pallas.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_focus_kernel(w6: jnp.ndarray) -> jnp.ndarray:
    """(6, 6, C, O) fused Focus kernel -> (2, 4*O, 32*C) GEMM kernel.

    Output ``[h, (py*2+px)*O + o, t*4C + s'*C + c]`` where t in [0, 8) is
    the padded-row tap, s = 4h + s' in [0, 8) the padded-col tap (h = the
    window half realised by the in-kernel lane roll), c the input channel.

    Derivation: stem output (2qy+py, 2qx+px, o) reads raw pixel
    (4qy + 2py + uy - 2, 4qx + 2px + ux - 2) for 6x6 taps (uy, ux); with a
    pad-2 origin shift the row tap is t = 2py + uy in [0, 8) and the col
    tap s = 2px + ux in [0, 8).
    """
    _, _, c, o = w6.shape
    k = jnp.zeros((8, 8, c, 2, 2, o), w6.dtype)
    for py in range(2):
        for px in range(2):
            k = k.at[2 * py:2 * py + 6, 2 * px:2 * px + 6, :, py, px, :].set(
                w6)
    k = k.reshape(8, 2, 4 * c, 4 * o)      # (t, h, s'c, po)
    k = k.transpose(1, 3, 0, 2)            # (h, po, t, s'c)
    return k.reshape(2, 4 * o, 32 * c)


def fold_bn(gamma, beta, mean, var, eps: float) -> Tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """Inference BatchNorm folded to a per-channel (scale, bias) pair,
    duplicated over the 4 s2d(2) sub-positions: y = x*scale + bias."""
    inv = gamma / jnp.sqrt(var + eps)
    scale = jnp.tile(inv, 4)
    bias = jnp.tile(beta - mean * inv, 4)
    return scale, bias


def _stem_kernel(x_ref, halo_ref, k_ref, sb_ref, out_ref, *, bh: int,
                 wout: int, wq: int, rows: int):
    def cast(u):
        if u.dtype == jnp.uint8:
            return u.astype(jnp.int32).astype(jnp.bfloat16)
        return u.astype(jnp.bfloat16)

    v = jnp.concatenate([cast(x_ref[:]).reshape(bh * rows, wq),
                         cast(halo_ref[:]).reshape(rows, wq)], axis=0)
    for j in range(bh):
        s = v[rows * j:rows * j + 2 * rows]            # (8*4C, wq) taps
        acc = (jnp.dot(k_ref[0], s, preferred_element_type=jnp.float32)
               + pltpu.roll(jnp.dot(k_ref[1], s,
                                    preferred_element_type=jnp.float32),
                            shift=wq - 1, axis=1))
        y = acc * sb_ref[0][:, None] + sb_ref[1][:, None]   # folded BN
        y = y * jax.nn.sigmoid(y)                           # SiLU
        out_ref[j] = y.astype(out_ref.dtype).T[:wout, :]


@functools.partial(jax.jit, static_argnames=('wout', 'interpret'))
def focus_stem_pallas(xpacked: jnp.ndarray, kpacked: jnp.ndarray,
                      scale: jnp.ndarray, bias: jnp.ndarray,
                      wout: int, interpret: bool = False) -> jnp.ndarray:
    """Evaluate the Focus stem (conv + BN + SiLU) as one pallas kernel.

    xpacked: (H/4 + 1, 16C, WQ) from ``stem_pack_np`` / ``stem_pack_xla``
      (uint8 or bf16), WQ >= W/4 + 1.
    kpacked: (2, 4*O, 32*C) from ``pack_focus_kernel``.
    scale/bias: (4*O,) from ``fold_bn``.
    wout: W/4 (static; not derivable from the lane-padded WQ).
    Returns (H/4, W/4, 4*O) in space_to_depth(., 2) layout, bf16.
    """
    hq, rows, wq = xpacked.shape
    hout = hq - 1
    o4, c32 = kpacked.shape[1:]
    cin = c32 // 32
    assert rows == 16 * cin, (rows, cin)
    assert wout < wq
    bh = next(b for b in (8, 4, 2, 1) if hout % b == 0)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)
    kern = functools.partial(_stem_kernel, bh=bh, wout=wout, wq=wq,
                             rows=rows)
    return pl.pallas_call(
        kern,
        grid=(hout // bh,),
        in_specs=[
            pl.BlockSpec((bh, rows, wq), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, wq), lambda j, _bh=bh: (_bh * j + _bh,
                                                           0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, o4, c32), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, o4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, wout, o4), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hout, wout, o4), jnp.bfloat16),
        interpret=interpret,
    )(xpacked, xpacked, kpacked.astype(jnp.bfloat16), sb)


def stem_pack_wq(w: int) -> int:
    """Lane-padded packed width for image width w: W/4 + 1 rounded up to
    the 128-lane tile (the pad columns are zero / garbage and the kernel
    discards them)."""
    return -(-(w // 4 + 1) // 128) * 128


def stem_pack_np(img: np.ndarray, wq: int = None) -> np.ndarray:
    """Host-side packer: (H, W, C) array -> (H/4 + 1, 16C, WQ).

    Element [g, r*4C + s'*C + c, q] = pad2(img)[4g + r, 4q + s', c] where
    pad2 zero-pads 2 on every edge.  H, W must be divisible by 4.  This is
    the numpy reference; production loaders use the C++ packer
    (csrc/stem_pack.cpp) which emits the identical layout.
    """
    h, w, c = img.shape
    wq = wq or stem_pack_wq(w)
    out = np.zeros(((h + 4) // 4, 16 * c, wq), img.dtype)
    x = np.zeros((h + 4, w + 4, c), img.dtype)
    x[2:2 + h, 2:2 + w] = img
    # (hq, 4, wq0, 4, c) -> [g, r, q, s', c]
    v = x.reshape((h + 4) // 4, 4, (w + 4) // 4, 4, c)
    v = v.transpose(0, 1, 3, 4, 2)          # (hq, r, s', c, q)
    hq, _, _, _, wq0 = v.shape
    out[:, :, :wq0] = v.reshape(hq, 16 * c, wq0)
    return out


def stem_pack_xla(img: jnp.ndarray, wq: int = None,
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    """Device-side packer (XLA): identical layout to ``stem_pack_np``.

    This exists for CPU tests and as a fallback; on TPU the minor-dim
    transpose it contains is the very op the packed layout avoids, so
    production paths pack on host.
    """
    h, w, c = img.shape
    wq = wq or stem_pack_wq(w)
    x = jnp.pad(img.astype(dtype), ((2, 2), (2, 2), (0, 0)))
    v = x.reshape((h + 4) // 4, 4, (w + 4) // 4, 4, c)
    v = v.transpose(0, 1, 3, 4, 2)
    hq, _, _, _, wq0 = v.shape
    v = v.reshape(hq, 16 * c, wq0)
    return jnp.pad(v, ((0, 0), (0, 0), (0, wq - wq0)))


def _pack_select_matrix(wpad: int, wq: int, wq0: int) -> jnp.ndarray:
    """(W+4, 4*WQ) one-hot selection matrix for the stride-4 phase pack:
    column n = s*WQ + q selects input x = 4q + s (zero for q >= WQ0).

    Strided access along the lane dimension is the one thing the TPU
    memory system cannot do — but a one-hot matmul on the MXU can: each
    output lane is an exact dot product with a single 1.  Same trick as
    the depth kernel's rank compaction (ops/depth_pallas.py)."""
    n = jnp.arange(4 * wq)
    s, q = n // wq, n % wq
    x = jnp.arange(wpad)
    sel = (x[:, None] == 4 * q[None, :] + s[None, :]) & (q[None, :] < wq0)
    return sel.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=('out_h', 'out_w', 'wq'))
def stem_pack_device(img_u8: jnp.ndarray, out_h: int, out_w: int,
                     wq: int = None) -> jnp.ndarray:
    """Device-side image packer via MXU selection matmuls: (H, W, 3) uint8
    raw frame -> (H'/4+1, 48, WQ) bf16, bit-identical values to the host
    packer (csrc/stem_pack.cpp) after its uint8->bf16 cast.

    The stride-4 lane selection rides the MXU (one-hot matmul, exact in
    bf16: every output element is x*1 summed with zeros), so packing costs
    ~26 GFLOP/frame of matmul instead of host CPU time — on-device packing
    frees the host for decode in the sustained serving loop."""
    h, w, _ = img_u8.shape
    wq = wq or stem_pack_wq(out_w)
    wpad, wq0 = out_w + 4, (out_w + 4) // 4
    hq = (out_h + 4) // 4
    x = jnp.pad(img_u8.astype(jnp.bfloat16),
                ((2, 2 + out_h - h), (2, 2 + out_w - w), (0, 0)))
    sel = _pack_select_matrix(wpad, wq, wq0)
    y = jnp.einsum('hwc,wn->chn', x, sel,
                   preferred_element_type=jnp.bfloat16)
    # y[c, h', s*WQ+q] -> out[g, r*12 + s*3 + c, q]   (h' = 4g + r)
    y = y.reshape(3, hq, 4, 4, wq).transpose(1, 2, 3, 0, 4)
    return y.reshape(hq, 48, wq)


@functools.partial(jax.jit, static_argnames=('out_h', 'out_w', 'wq'))
def stem_pack_disp_device(disp_u16: jnp.ndarray, out_h: int, out_w: int,
                          wq: int = None) -> jnp.ndarray:
    """Device-side disparity packer: (H, W) uint16 SGBM/16 raw disparity ->
    (H'/4+1, 16, WQ) bf16 disp_postp (65535 -> 0, /16), identical layout
    and rounding to ``stem_pack_disp_bf16_batch`` (round-to-nearest-even
    both here and in csrc/stem_pack.cpp:42-48)."""
    h, w = disp_u16.shape
    wq = wq or stem_pack_wq(out_w)
    wpad, wq0 = out_w + 4, (out_w + 4) // 4
    hq = (out_h + 4) // 4
    d = jnp.where(disp_u16 == jnp.uint16(65535), jnp.uint16(0), disp_u16)
    d = (d.astype(jnp.float32) / 16.0).astype(jnp.bfloat16)
    x = jnp.pad(d, ((2, 2 + out_h - h), (2, 2 + out_w - w)))
    sel = _pack_select_matrix(wpad, wq, wq0)
    y = jnp.einsum('hw,wn->hn', x, sel,
                   preferred_element_type=jnp.bfloat16)
    y = y.reshape(hq, 4, 4, wq)
    return y.reshape(hq, 16, wq)


def pallas_stem_outputs(backbone_params, backbone_stats, img_pack,
                        disp_pack, wout: int, eps: float = 1e-3,
                        interpret: bool = False):
    """Compute both branch stem activations from packed inputs using the
    CANONICAL backbone parameter tree (CSPDarknetDual: 'stem'/'disp_stem'
    each holding conv/conv/kernel + conv/bn stats).

    img_pack: (H/4+1, 48, WQ) uint8; disp_pack: (H/4+1, 16, WQ) bf16 of
    disp_postp values.  The disp branch's canonical kernel has 3 identical
    input channels (disp_postp = repeat(disp, 3)); feeding 1-channel packed
    disparity with the channel-summed kernel is exact.

    Returns (stem_out, disp_stem_out), each (H/4, W/4, 4*O) bf16 in
    space_to_depth(., 2) layout.
    """
    from ..models.layers import focus_kernel_to_strided

    def branch(name, pack, sum_c):
        k = backbone_params[name]['conv']['conv']['kernel']
        bn_p = backbone_params[name]['conv']['bn']
        bn_s = backbone_stats[name]['conv']['bn']
        w6 = focus_kernel_to_strided(k)
        if sum_c:
            w6 = jnp.sum(w6, axis=2, keepdims=True)
        kp = pack_focus_kernel(w6)
        scale, bias = fold_bn(bn_p['scale'], bn_p['bias'], bn_s['mean'],
                              bn_s['var'], eps)
        return focus_stem_pallas(pack, kp, scale, bias, wout,
                                 interpret=interpret)

    return (branch('stem', img_pack, False),
            branch('disp_stem', disp_pack, True))
