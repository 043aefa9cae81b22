"""Equivalence of the fused stage-1 pallas kernel against the XLA paths.

The kernel (ops/stage1_pallas.py) must reproduce the dual stage 1 — both
branches' stride-2 conv + CSP layer + branch average
(CSPDarknetDual, models/csp_darknet.py) — up to bf16 rounding, in the
W-folded layout the stage-2 ``fold_in`` path consumes, from the pallas
stems' s2d(2) activations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.csp_darknet import P5_ARCH, _Stage
from stereotracking_tpu.models.layers import make_round, widen
from stereotracking_tpu.ops.stage1_pallas import (stage1_dual_pallas,
                                                  stage1_fused_weights)

INTERP = jax.default_backend() != 'tpu'


def _init_stage1(wf, seed=0, h4=16, w4=32):
    """Init a dual stage-1 parameter tree with randomized BN stats and
    random s2d(2) stem activations."""
    rng = np.random.RandomState(seed)
    s1 = P5_ARCH[0]
    st1 = _Stage(widen(s1[1], wf), make_round(s1[2], 0.33), s1[3], s1[4],
                 dtype=jnp.bfloat16)
    c4 = 4 * widen(64, wf)
    so = jnp.asarray(rng.randn(h4, w4, c4).astype(np.float32) * 0.8,
                     jnp.bfloat16)
    dso = jnp.asarray(rng.randn(h4, w4, c4).astype(np.float32) * 0.8,
                      jnp.bfloat16)
    bparams, bstats = {}, {}
    for i, name in enumerate(('stage1', 'disp_stage1')):
        v = st1.init(jax.random.PRNGKey(seed + i), so[None], s2d_in=True,
                     fold_out=True)
        # randomize BN statistics so the fold is actually exercised
        stats = jax.tree.map(
            lambda x: jnp.asarray(
                rng.rand(*x.shape).astype(np.float32) * 0.5 + 0.5),
            v['batch_stats'])
        params = jax.tree.map(
            lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32)
                                  * (0.3 if x.ndim > 1 else 0.2) +
                                  (0.0 if x.ndim > 1 else 1.0)), v['params'])
        bparams[name], bstats[name] = params, stats
    return st1, bparams, bstats, so, dso


def _xla_stage1_dual(st1, bparams, bstats, so, dso):
    a = st1.apply({'params': bparams['stage1'],
                   'batch_stats': bstats['stage1']},
                  so[None], s2d_in=True, fold_out=True)[0]
    b = st1.apply({'params': bparams['disp_stage1'],
                   'batch_stats': bstats['disp_stage1']},
                  dso[None], s2d_in=True, fold_out=True)[0]
    return (a + b) / 2.0


@pytest.mark.parametrize('wf,h4,w4,band', [
    (0.5, 16, 32, 4),     # flagship channel widths (C=32, O=64)
    (0.5, 12, 64, 4),     # H4 not divisible by 4 -> band shrinks to 2
    (0.25, 16, 32, 8),    # narrow variant, whole-array band
])
def test_stage1_pallas_matches_xla_folded(wf, h4, w4, band):
    st1, bparams, bstats, so, dso = _init_stage1(wf, h4=h4, w4=w4)
    ref = np.asarray(_xla_stage1_dual(st1, bparams, bstats, so, dso),
                     np.float32)
    wts = stage1_fused_weights(bparams, bstats)
    out = np.asarray(stage1_dual_pallas(so, dso, wts, interpret=INTERP,
                                        band=band), np.float32)
    assert out.shape == ref.shape == (h4, w4 // 2, ref.shape[-1])
    scale = np.max(np.abs(ref))
    err = np.max(np.abs(out - ref))
    assert err <= 2e-2 * scale + 1e-3, (err, scale)


def test_stage1_pallas_edge_rows_zero_padding():
    """First/last rows exercise the entry conv's and the bottleneck 3x3's
    zero padding across band boundaries: compare band=2 vs band=8 (different
    halo decompositions must agree bit-for-bit)."""
    _, bparams, bstats, so, dso = _init_stage1(0.5, seed=3, h4=16, w4=32)
    wts = stage1_fused_weights(bparams, bstats)
    a = np.asarray(stage1_dual_pallas(so, dso, wts, interpret=INTERP,
                                      band=2), np.float32)
    b = np.asarray(stage1_dual_pallas(so, dso, wts, interpret=INTERP,
                                      band=8), np.float32)
    np.testing.assert_array_equal(a, b)


def test_stage1_pallas_vmap_matches_loop():
    st1, bparams, bstats, so, dso = _init_stage1(0.5, seed=5)
    wts = stage1_fused_weights(bparams, bstats)
    sos = jnp.stack([so, so * jnp.bfloat16(0.5)])
    dsos = jnp.stack([dso, dso * jnp.bfloat16(2.0)])
    batched = jax.vmap(lambda a, b: stage1_dual_pallas(
        a, b, wts, interpret=INTERP))(sos, dsos)
    for i in range(2):
        one = stage1_dual_pallas(sos[i], dsos[i], wts, interpret=INTERP)
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(one))


def test_full_program_stage1_pallas_matches_xla():
    """Full detector forward with the fused stage-1 kernel ('stage1_out'
    entry) vs the packed-stem XLA stage-1 path: same parameters, head
    outputs must agree (bf16 rounding only); and the full per-frame MOT
    program runs end-to-end with stage1_backend='pallas'."""
    from stereotracking_tpu.models import tracker as trk
    from stereotracking_tpu.models.mot import MOTConfig, predict_frame_raw
    from stereotracking_tpu.models.preprocessor import preprocess_frame_pure
    from stereotracking_tpu.ops.stage1_pallas import pallas_stage1_out
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 64, 96
    cfg = MOTConfig(stem_backend='pallas', stage1_backend='pallas')
    ms = MultiStreamTracker(cfg, n_streams=1, input_shape=(h, w))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    disp = rng.randint(16, 1600, (h, w), np.uint16)

    inputs = preprocess_frame_pure(jnp.asarray(img), jnp.asarray(disp), h, w)
    ip, dp = MultiStreamTracker.pack_frames(img[None], disp[None], h, w)
    so, dso = pallas_stem_outputs(
        ms.variables['params']['backbone'],
        ms.variables['batch_stats']['backbone'],
        jnp.asarray(ip[0]), jnp.asarray(dp[0]), w // 4, interpret=INTERP)

    ref = ms.module.apply(ms.variables, {**inputs, 'stem_out': so,
                                         'disp_stem_out': dso}, train=False)
    y1 = pallas_stage1_out(ms.variables['params']['backbone'],
                           ms.variables['batch_stats']['backbone'],
                           so, dso, interpret=INTERP)
    out = ms.module.apply(ms.variables, {**inputs, 'stage1_out': y1},
                          train=False)
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


def test_builder_stage1_backend_key():
    from stereotracking_tpu.apis.builder import build_mot_config
    cfg = build_mot_config({'type': 'OCSORT_Disparity',
                            'stem_backend': 'pallas',
                            'stage1_backend': 'pallas'})
    assert cfg.stage1_backend == 'pallas' and cfg.stem_backend == 'pallas'
    assert build_mot_config({'type': 'OCSORT_Disparity'}).stage1_backend \
        == 'xla'


def test_stage1_pallas_rejects_deep_variants():
    st1, bparams, bstats, so, dso = _init_stage1(0.5, seed=7)
    bparams['stage1']['csp']['blocks_1'] = \
        bparams['stage1']['csp']['blocks_0']
    with pytest.raises(ValueError, match='num_blocks'):
        stage1_fused_weights(bparams, bstats)
