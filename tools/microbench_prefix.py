"""Per-sub-slice timing of the backbone PREFIX in the PACKED serving path.

Round-4 finding (tools/perf_breakdown.py STTPU_STAGES=1, real v5e):
stages 3+4 cost 1.4 ms of the 33.5 ms backbone — the whole cost is the
high-resolution prefix (stems + dual stage1 + stage2).  This probe splits
that prefix in the production (host-packed pallas stem) layout:

  pallas_stems   — both Focus stems from packed frames (ops/stem_pallas.py)
  stage1_dual    — both stage-1 stages (s2d_in, fold_out) + average
  stage2         — fold_consume conv + CSP
  s1_s2_s3_s4    — full backbone from stem_out (packed path, stages only)

Run alone on the chip:  python tools/microbench_prefix.py
"""
import json
import os
import sys

import numpy as np

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

from perf_breakdown import timed_scan  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')

    from stereotracking_tpu.models.csp_darknet import (P5_ARCH,
                                                       CSPDarknetDual,
                                                       _Stage)
    from stereotracking_tpu.models.layers import make_round, widen
    from stereotracking_tpu.models.mot import MOTConfig
    from stereotracking_tpu.models.preprocessor import padded_shape
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 1080, 1920
    n_streams = 8
    oh, ow = padded_shape(h, w)
    dtype = jnp.bfloat16
    cfg = MOTConfig()
    wf, df = cfg.detector.widen_factor, cfg.detector.deepen_factor

    ms = MultiStreamTracker(cfg, n_streams=n_streams, dtype=dtype,
                            input_shape=(oh, ow))
    bparams = ms.variables['params']['backbone']
    bstats = ms.variables['batch_stats']['backbone']

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (n_streams, h, w, 3), np.uint8)
    disps = rng.randint(16, 1600, (n_streams, h, w), np.uint16)
    ip, dp = MultiStreamTracker.pack_frames(imgs, disps, oh, ow)
    ip, dp = jnp.asarray(ip), jnp.asarray(dp)

    report = {}
    interp = jax.default_backend() != 'tpu'

    def stems(ip, dp):
        return jax.vmap(lambda i, d: pallas_stem_outputs(
            bparams, bstats, i, d, ow // 4, interpret=interp))(ip, dp)

    report['pallas_stems_ms'] = timed_scan(stems, (ip, dp),
                                           perturb=(0, 1)) * 1e3

    so, dso = jax.tree.map(jnp.asarray, stems(ip, dp))
    so = so.astype(dtype)
    dso = dso.astype(dtype)

    s1 = P5_ARCH[0]
    st1 = _Stage(widen(s1[1], wf), make_round(s1[2], df), s1[3], s1[4],
                 dtype=dtype)
    v_rgb = {'params': bparams['stage1'], 'batch_stats': bstats['stage1']}
    v_dsp = {'params': bparams['disp_stage1'],
             'batch_stats': bstats['disp_stage1']}

    def stage1_dual(so, dso):
        a = jax.vmap(lambda x: st1.apply(v_rgb, x[None], s2d_in=True,
                                         fold_out=True)[0])(so)
        b = jax.vmap(lambda x: st1.apply(v_dsp, x[None], s2d_in=True,
                                         fold_out=True)[0])(dso)
        return (a + b) / 2.0

    report['stage1_dual_ms'] = timed_scan(stage1_dual, (so, dso),
                                          perturb=(0, 1)) * 1e3

    # fused pallas stage-1 kernel (ops/stage1_pallas.py); STTPU_BAND tunes
    # the row-band size (VMEM working set vs recompute at band edges)
    from stereotracking_tpu.ops.stage1_pallas import (stage1_dual_pallas,
                                                      stage1_fused_weights)
    band = int(os.environ.get('STTPU_BAND', '4'))
    wts = stage1_fused_weights(bparams, bstats)

    def stage1_fused(so, dso):
        return jax.vmap(lambda a, b: stage1_dual_pallas(
            a, b, wts, interpret=interp, band=band))(so, dso)

    report['stage1_pallas_ms'] = timed_scan(stage1_fused, (so, dso),
                                            perturb=(0, 1)) * 1e3
    ref = np.asarray(stage1_dual(so, dso), np.float32)
    fused = np.asarray(stage1_fused(so, dso), np.float32)
    report['stage1_pallas_maxerr'] = float(
        np.max(np.abs(ref - fused)) / (np.max(np.abs(ref)) + 1e-9))

    y1 = jnp.asarray(stage1_dual(so, dso))

    s2 = P5_ARCH[1]
    st2 = _Stage(widen(s2[1], wf), make_round(s2[2], df), s2[3], s2[4],
                 dtype=dtype)
    v2 = {'params': bparams['stage2'], 'batch_stats': bstats['stage2']}

    def stage2(y):
        return jax.vmap(lambda x: st2.apply(v2, x[None], fold_in=True)[0])(y)

    report['stage2_ms'] = timed_scan(stage2, (y1,), perturb=0) * 1e3

    # fused pallas stage-2 kernel (ops/stage2_pallas.py): folded in/out
    from stereotracking_tpu.ops.stage2_pallas import (stage2_fold_pallas,
                                                      stage2_fused_weights,
                                                      unfold_w)
    wts2 = stage2_fused_weights(bparams, bstats)
    band2 = int(os.environ.get('STTPU_BAND2', '4'))

    def stage2_fused(y):
        return jax.vmap(lambda x: stage2_fold_pallas(
            x, wts2, interpret=interp, band=band2))(y)

    report['stage2_pallas_ms'] = timed_scan(stage2_fused, (y1,),
                                            perturb=0) * 1e3
    ref2 = np.asarray(stage2(y1), np.float32)
    fused2 = np.asarray(unfold_w(stage2_fused(y1)), np.float32)
    report['stage2_pallas_maxerr'] = float(
        np.max(np.abs(ref2 - fused2)) / (np.max(np.abs(ref2)) + 1e-9))

    # stages from stem_out through the real backbone (packed-path graph)
    bb = CSPDarknetDual(df, wf, dtype=dtype)
    bv = {'params': bparams, 'batch_stats': bstats}

    def stages_all(so, dso):
        return jax.vmap(lambda a, b: bb.apply(
            bv, {'stem_out': a, 'disp_stem_out': b}))(so, dso)

    report['s1_to_s4_ms'] = timed_scan(stages_all, (so, dso),
                                       perturb=(0, 1)) * 1e3

    report = {k: round(v, 3) for k, v in report.items()}
    report['note'] = (f'{n_streams} streams x {h}x{w} bf16, packed serving '
                      'layout; ms per batched step')
    print(json.dumps(report))


if __name__ == '__main__':
    main()
