"""Equivalence of the fused stage-3 pallas path against the XLA paths.

Stage 3 reuses the generic stage-2 kernel (ops/stage2_pallas.py) on the
``stage3`` parameter subtree (``pallas_stage3_out``): stride-2 entry conv
+ CSP chain, consuming the stage-2 kernel's W-folded activations and
emitting the W-folded layout stage 4's ``fold_consume`` entry consumes.
The XLA oracle is the same module evaluated with ``fold_out=True``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.csp_darknet import P5_ARCH, _Stage
from stereotracking_tpu.models.layers import make_round, widen
from stereotracking_tpu.ops.stage2_pallas import (pallas_stage3_out,
                                                  stage2_fold_pallas,
                                                  stage2_fused_weights,
                                                  unfold_w)

INTERP = jax.default_backend() != 'tpu'


def _init_stage3(wf, seed=0, h8=16, w4=16, df=0.33):
    """Init a stage-3 parameter tree with randomized BN stats and a random
    W-folded stage-2 activation."""
    rng = np.random.RandomState(seed)
    s3 = P5_ARCH[2]
    st3 = _Stage(widen(s3[1], wf), make_round(s3[2], df), s3[3], s3[4],
                 dtype=jnp.bfloat16)
    c2 = 2 * widen(256, wf)               # folded stage-2 channels
    y2 = jnp.asarray(rng.randn(h8, w4, c2).astype(np.float32) * 0.8,
                     jnp.bfloat16)
    v = st3.init(jax.random.PRNGKey(seed), y2[None], fold_out=True)
    stats = jax.tree.map(
        lambda x: jnp.asarray(
            rng.rand(*x.shape).astype(np.float32) * 0.5 + 0.5),
        v['batch_stats'])
    params = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32)
                              * (0.3 if x.ndim > 1 else 0.2) +
                              (0.0 if x.ndim > 1 else 1.0)), v['params'])
    return st3, {'stage3': params}, {'stage3': stats}, y2


@pytest.mark.parametrize('wf,h8,w4,band', [
    (0.5, 16, 16, 4),     # flagship widths one level down (C=128, O=256)
    (0.25, 24, 16, 4),    # narrow variant, three bands
])
def test_stage3_pallas_matches_xla_folded(wf, h8, w4, band):
    st3, bparams, bstats, y2 = _init_stage3(wf, h8=h8, w4=w4)
    ref = np.asarray(st3.apply({'params': bparams['stage3'],
                                'batch_stats': bstats['stage3']},
                               y2[None], fold_out=True)[0], np.float32)
    out = np.asarray(pallas_stage3_out(bparams, bstats, y2,
                                       interpret=INTERP, band=band),
                     np.float32)
    assert out.shape == ref.shape == (h8 // 2, w4 // 2, ref.shape[-1])
    scale = np.max(np.abs(ref))
    err = np.max(np.abs(out - ref))
    assert err <= 2e-2 * scale + 1e-3, (err, scale)


def test_full_program_stage3_pallas_matches_xla():
    """Full detector forward with all three fused stage kernels
    ('stage3_out' entry) vs the packed-stem XLA path, plus an end-to-end
    per-frame MOT run with stage3_backend='pallas'."""
    from stereotracking_tpu.models import tracker as trk
    from stereotracking_tpu.models.mot import MOTConfig, predict_frame_raw
    from stereotracking_tpu.models.preprocessor import preprocess_frame_pure
    from stereotracking_tpu.ops.stage1_pallas import pallas_stage1_out
    from stereotracking_tpu.ops.stage2_pallas import pallas_stage2_out
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 64, 96
    cfg = MOTConfig(stem_backend='pallas', stage1_backend='pallas',
                    stage2_backend='pallas', stage3_backend='pallas')
    ms = MultiStreamTracker(cfg, n_streams=1, input_shape=(h, w))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    disp = rng.randint(16, 1600, (h, w), np.uint16)

    inputs = preprocess_frame_pure(jnp.asarray(img), jnp.asarray(disp), h, w)
    ip, dp = MultiStreamTracker.pack_frames(img[None], disp[None], h, w)
    bp = ms.variables['params']['backbone']
    bs = ms.variables['batch_stats']['backbone']
    so, dso = pallas_stem_outputs(bp, bs, jnp.asarray(ip[0]),
                                  jnp.asarray(dp[0]), w // 4,
                                  interpret=INTERP)
    ref = ms.module.apply(ms.variables, {**inputs, 'stem_out': so,
                                         'disp_stem_out': dso}, train=False)
    y1 = pallas_stage1_out(bp, bs, so, dso, interpret=INTERP)
    y2 = pallas_stage2_out(bp, bs, y1, interpret=INTERP)
    y3 = pallas_stage3_out(bp, bs, y2, interpret=INTERP)
    out = ms.module.apply(ms.variables, {**inputs, 'stage2_out': y2,
                                         'stage3_out': y3}, train=False)
    for a, b in zip(ref, out):
        for xa, xb in zip(a, b):
            xa, xb = np.asarray(xa, np.float32), np.asarray(xb, np.float32)
            scale = np.max(np.abs(xa)) + 1e-6
            assert np.max(np.abs(xa - xb)) / scale < 5e-2

    state0 = trk.init_state(cfg.tracker)
    _, res = predict_frame_raw(
        ms.variables, ms.module, state0, jnp.asarray(img),
        jnp.asarray(disp), jnp.int32(0), cfg, h, w,
        img_pack=jnp.asarray(ip[0]), disp_pack=jnp.asarray(dp[0]))
    assert np.asarray(res.det_valid).shape[0] > 0


def test_builder_stage3_backend_key():
    from stereotracking_tpu.apis.builder import build_mot_config
    cfg = build_mot_config({'type': 'OCSORT_Disparity',
                            'stem_backend': 'pallas',
                            'stage1_backend': 'pallas',
                            'stage2_backend': 'pallas',
                            'stage3_backend': 'pallas'})
    assert cfg.stage3_backend == 'pallas'
    assert build_mot_config({'type': 'OCSORT_Disparity'}).stage3_backend \
        == 'xla'
    # explicit stage3=pallas without stage2=pallas is a config error
    with np.testing.assert_raises(ValueError):
        build_mot_config({'type': 'OCSORT_Disparity',
                          'stage3_backend': 'pallas'})
    # 'auto' resolves to xla EVERYWHERE: the fused stage-3 kernel was
    # retired by the r5 chip A/B (3.7 ms/step net regression vs XLA's
    # stage3+4+neck fusion — apis/builder._resolve_stage_backends)
    assert build_mot_config({'type': 'OCSORT_Disparity',
                             'stage3_backend': 'auto'}).stage3_backend \
        == 'xla'
