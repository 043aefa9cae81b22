"""On-chip A/B probe for fused stage-1 kernel formulations.

The first compiled stage-1 kernel (ops/stage1_pallas.py) measured 75 ms
per 8-stream 1080p step vs 7.4 ms for the XLA folded path — 10x SLOWER
than the op-by-op baseline it was meant to beat.  Three suspects, each
isolated here as a kernel variant timed on the real chip:

  band     — per-band fixed overheads (68 grid steps at band=4)
  split    — the in-kernel sublane-stride-2 deinterleave
             ``x.reshape(M, 2, C)[:, 0]`` (Mosaic lowers interleaved
             sublane selects poorly); variant moves the even/odd cell
             split OUTSIDE the kernel (one XLA relayout per frame)
  roll     — bf16 sublane shifts as zero-concat copies (Mosaic's rotate
             is 32-bit-only, so the kernel concatenates); variant shifts
             via f32-cast ``pltpu.roll`` instead

Variants produce bit-identical outputs to the production kernel (asserted
per run): shifts only differ in masked-off or halo-margin rows.

Run alone on the chip:  python tools/probe_stage1_variants.py
"""
import functools
import json
import os
import sys
import time

import numpy as np

if __name__ == '__main__' and not __package__:
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def make_variant(split_eo: bool, roll_f32: bool):
    """Build a (stem_rgb, stem_dsp, wts, band) -> folded stage-1 fn."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stereotracking_tpu.ops.stage1_pallas import (_act, _shift_down,
                                                      _shift_up)

    f32 = jnp.float32

    def shift_down(x, n):
        if roll_f32:
            return pltpu.roll(x.astype(f32), shift=n,
                              axis=0).astype(x.dtype)
        return _shift_down(x, n)

    def shift_up(x, n):
        if roll_f32:
            return pltpu.roll(x.astype(f32), shift=x.shape[0] - n,
                              axis=0).astype(x.dtype)
        return _shift_up(x, n)

    def kernel(*refs, B, W2, NB):
        if split_eo:
            (pe_r, me_r, qe_r, po_r, mo_r, qo_r,
             pe_d, me_d, qe_d, po_d, mo_d, qo_d,
             wconv, wms, wc1, wc2, wfin,
             sbconv, sbms, sbc1, sbc2, sbfin, out_ref) = refs
        else:
            (pre_r, main_r, post_r, pre_d, main_d, post_d,
             wconv, wms, wc1, wc2, wfin,
             sbconv, sbms, sbc1, sbc2, sbfin, out_ref) = refs
        j = pl.program_id(0)
        wconv, wms, wc1, wc2, wfin = (wconv[...], wms[...], wc1[...],
                                      wc2[...], wfin[...])
        sbconv, sbms, sbc1, sbc2, sbfin = (
            sbconv[...], sbms[...], sbc1[...], sbc2[...], sbfin[...])
        o2 = wconv.shape[-1]
        m4 = wc1.shape[0]
        h = m4 // 2
        M2 = (B + 2) * W2
        M3 = B * W2

        iota = jax.lax.broadcasted_iota(jnp.int32, ((B + 3) * W2, 1), 0)
        not_first_col = (iota % W2) != 0

        def edges(x):
            return jnp.concatenate([
                jnp.where(j == 0, 0, x[0]),
                x[1],
                jnp.where(j == NB - 1, 0, x[2]),
            ], axis=0)

        def branch_split(pe, me, qe, po, mo, qo, bi):
            e = edges((pe[...], me[...], qe[...])).reshape(-1, pe.shape[-1])
            o = edges((po[...], mo[...], qo[...])).reshape(-1, po.shape[-1])
            osh = jnp.where(not_first_col, shift_down(o, 1), 0)
            acc = jnp.zeros((M2, o2), f32)
            for gy in range(2):
                sl = slice(gy * W2, gy * W2 + M2)
                for src, wsrc in ((e, 0), (o, 1), (osh, 2)):
                    acc += jnp.dot(src[sl], wconv[bi, gy, wsrc],
                                   preferred_element_type=f32)
            z = _act(acc, sbconv[bi])
            return _act(jnp.dot(z, wms[bi], preferred_element_type=f32),
                        sbms[bi])

        def branch_joint(pre, main, post, bi):
            x = edges((pre[...], main[...], post[...]))
            x = x.reshape((B + 3) * W2, 2, x.shape[-1])
            e, o = x[:, 0, :], x[:, 1, :]
            osh = jnp.where(not_first_col, shift_down(o, 1), 0)
            acc = jnp.zeros((M2, o2), f32)
            for gy in range(2):
                sl = slice(gy * W2, gy * W2 + M2)
                for src, wsrc in ((e, 0), (o, 1), (osh, 2)):
                    acc += jnp.dot(src[sl], wconv[bi, gy, wsrc],
                                   preferred_element_type=f32)
            z = _act(acc, sbconv[bi])
            return _act(jnp.dot(z, wms[bi], preferred_element_type=f32),
                        sbms[bi])

        if split_eo:
            ms_r = branch_split(pe_r, me_r, qe_r, po_r, mo_r, qo_r, 0)
            ms_d = branch_split(pe_d, me_d, qe_d, po_d, mo_d, qo_d, 1)
        else:
            ms_r = branch_joint(pre_r, main_r, post_r, 0)
            ms_d = branch_joint(pre_d, main_d, post_d, 1)

        maind = jnp.concatenate([ms_r[:, :h], ms_d[:, :h]], axis=1)
        c1 = _act(jnp.dot(maind, wc1, preferred_element_type=f32), sbc1)
        rowid = jax.lax.broadcasted_iota(jnp.int32, (M2, 1), 0)
        edge = (((j == 0) & (rowid < W2))
                | ((j == NB - 1) & (rowid >= (B + 1) * W2)))
        c1 = jnp.where(edge, 0, c1)
        c1p = jnp.where((rowid % W2) != 0, shift_down(c1, 1), 0)
        c1m = jnp.where((rowid % W2) != W2 - 1, shift_up(c1, 1), 0)
        srcs = (c1p, c1, c1m)
        acc2 = jnp.zeros((M3, m4), f32)
        for ky in range(3):
            sl = slice(ky * W2, ky * W2 + M3)
            for gx in range(3):
                acc2 += jnp.dot(srcs[gx][sl], wc2[ky, gx],
                                preferred_element_type=f32)
        blk = _act(acc2, sbc2) + maind[W2:W2 + M3]

        fr = _act(jnp.dot(blk, wfin[0, 0], preferred_element_type=f32)
                  + jnp.dot(ms_r[W2:W2 + M3], wfin[0, 1],
                            preferred_element_type=f32), sbfin[0])
        fd = _act(jnp.dot(blk, wfin[1, 0], preferred_element_type=f32)
                  + jnp.dot(ms_d[W2:W2 + M3], wfin[1, 1],
                            preferred_element_type=f32), sbfin[1])
        y = (fr.astype(f32) + fd.astype(f32)) * 0.5
        out_ref[...] = y.astype(jnp.bfloat16).reshape(B, W2, o2)

    @functools.partial(jax.jit, static_argnames=('band',))
    def run(stem_rgb, stem_dsp, wts, band=4):
        H4, W4, _ = stem_rgb.shape
        W2 = W4 // 2
        B = band
        NB = H4 // B
        o2 = wts.conv.shape[-1]
        bf16 = jnp.bfloat16

        def hspecs(shape):
            return [
                pl.BlockSpec((2,) + shape[1:],
                             lambda jj: (jnp.maximum(jj * (B // 2) - 1, 0),
                                         0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B,) + shape[1:], lambda jj: (jj, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + shape[1:],
                             lambda jj: (jnp.minimum(jj * B + B, H4 - 1),
                                         0, 0),
                             memory_space=pltpu.VMEM),
            ]

        if split_eo:
            def deint(x):
                v = x.reshape(H4, W2, 2, x.shape[-1])
                return v[:, :, 0], v[:, :, 1]
            e_r, o_r = deint(stem_rgb)
            e_d, o_d = deint(stem_dsp)
            xs = [e_r, e_r, e_r, o_r, o_r, o_r, e_d, e_d, e_d, o_d, o_d, o_d]
            xspecs = (hspecs(e_r.shape) + hspecs(o_r.shape)
                      + hspecs(e_d.shape) + hspecs(o_d.shape))
        else:
            xs = [stem_rgb, stem_rgb, stem_rgb, stem_dsp, stem_dsp, stem_dsp]
            xspecs = hspecs(stem_rgb.shape) * 2
        wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
        kern = functools.partial(kernel, B=B, W2=W2, NB=NB)
        return pl.pallas_call(
            kern,
            grid=(NB,),
            in_specs=xspecs + wspecs,
            out_specs=pl.BlockSpec((B, W2, o2), lambda jj: (jj, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H4, W2, o2), bf16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*xs,
          wts.conv.astype(bf16), wts.ms.astype(bf16), wts.c1.astype(bf16),
          wts.c2.astype(bf16), wts.fin.astype(bf16),
          wts.conv_sb, wts.ms_sb, wts.c1_sb, wts.c2_sb, wts.fin_sb)

    return run


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')

    from stereotracking_tpu.models.mot import MOTConfig
    from stereotracking_tpu.models.preprocessor import padded_shape
    from stereotracking_tpu.ops.stage1_pallas import (stage1_dual_pallas,
                                                      stage1_fused_weights)
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 1080, 1920
    n = 8
    oh, ow = padded_shape(h, w)
    cfg = MOTConfig()
    ms = MultiStreamTracker(cfg, n_streams=n, dtype=jnp.bfloat16,
                            input_shape=(oh, ow))
    bparams = ms.variables['params']['backbone']
    bstats = ms.variables['batch_stats']['backbone']

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (n, h, w, 3), np.uint8)
    disps = rng.randint(16, 1600, (n, h, w), np.uint16)
    ip, dp = MultiStreamTracker.pack_frames(imgs, disps, oh, ow)

    stems = jax.jit(jax.vmap(lambda a, b: pallas_stem_outputs(
        bparams, bstats, a, b, ow // 4)))
    so, dso = jax.block_until_ready(stems(jnp.asarray(ip), jnp.asarray(dp)))
    wts = stage1_fused_weights(bparams, bstats)

    def timeit(fn, iters=20):
        y = jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn()
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / iters * 1e3, y

    out = {}
    base_ms, ref = timeit(lambda: jax.vmap(
        lambda a, b: stage1_dual_pallas(a, b, wts, band=4))(so, dso))
    out['current_band4_ms'] = round(base_ms, 2)
    ref = np.asarray(ref, np.float32)

    for name, split, roll, band in [
        ('band16', False, False, 16),
        ('split_band4', True, False, 4),
        ('split_band16', True, False, 16),
        ('roll_band4', False, True, 4),
        ('split_roll_band16', True, True, 16),
        ('split_roll_band4', True, True, 4),
    ]:
        try:
            fn = make_variant(split, roll)
            ms_t, y = timeit(lambda: jax.vmap(
                lambda a, b: fn(a, b, wts, band=band))(so, dso))
            err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
            out[name + '_ms'] = round(ms_t, 2)
            out[name + '_maxerr'] = err
        except Exception as e:  # lowering gaps are data too
            out[name + '_error'] = str(e)[:200]
        print(json.dumps({k: out[k] for k in sorted(out)}), flush=True)


if __name__ == '__main__':
    main()
