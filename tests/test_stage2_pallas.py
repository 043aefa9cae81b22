"""Equivalence of the fused stage-2 pallas kernel against the XLA paths.

The kernel (ops/stage2_pallas.py) must reproduce backbone stage 2 — the
stride-2 entry conv + CSP layer (models/csp_darknet.py _Stage) — up to
bf16 rounding, consuming the fused stage-1 kernel's W-folded activations
and emitting the W-folded layout stage 3's ``fold_consume`` entry
consumes.  The XLA oracle is the same module evaluated with
``fold_out=True`` (the tested ``fold_through`` kernel remap).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.csp_darknet import P5_ARCH, _Stage
from stereotracking_tpu.models.layers import make_round, widen
from stereotracking_tpu.ops.stage2_pallas import (stage2_fold_pallas,
                                                  stage2_fused_weights,
                                                  unfold_w)

INTERP = jax.default_backend() != 'tpu'


def _init_stage2(wf, seed=0, h4=16, w2=16, df=0.33):
    """Init a stage-2 parameter tree with randomized BN stats and a random
    W-folded stage-1 activation."""
    rng = np.random.RandomState(seed)
    s2 = P5_ARCH[1]
    st2 = _Stage(widen(s2[1], wf), make_round(s2[2], df), s2[3], s2[4],
                 dtype=jnp.bfloat16)
    c2 = 2 * widen(128, wf)               # folded stage-1 channels
    y1 = jnp.asarray(rng.randn(h4, w2, c2).astype(np.float32) * 0.8,
                     jnp.bfloat16)
    v = st2.init(jax.random.PRNGKey(seed), y1[None], fold_out=True)
    stats = jax.tree.map(
        lambda x: jnp.asarray(
            rng.rand(*x.shape).astype(np.float32) * 0.5 + 0.5),
        v['batch_stats'])
    params = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32)
                              * (0.3 if x.ndim > 1 else 0.2) +
                              (0.0 if x.ndim > 1 else 1.0)), v['params'])
    return st2, {'stage2': params}, {'stage2': stats}, y1


def _xla_stage2_folded(st2, bparams, bstats, y1):
    return st2.apply({'params': bparams['stage2'],
                      'batch_stats': bstats['stage2']},
                     y1[None], fold_out=True)[0]


@pytest.mark.parametrize('wf,h4,w2,band', [
    (0.5, 16, 16, 4),     # flagship channel widths (C=64, O=128), 3 blocks
    (0.5, 24, 32, 4),     # H8=12 -> bands of 4, three bands
    (0.25, 16, 16, 4),    # narrow variant
])
def test_stage2_pallas_matches_xla_folded(wf, h4, w2, band):
    st2, bparams, bstats, y1 = _init_stage2(wf, h4=h4, w2=w2)
    ref = np.asarray(_xla_stage2_folded(st2, bparams, bstats, y1),
                     np.float32)
    wts = stage2_fused_weights(bparams, bstats)
    out = np.asarray(stage2_fold_pallas(y1, wts, interpret=INTERP,
                                        band=band), np.float32)
    assert out.shape == ref.shape == (h4 // 2, w2 // 2, ref.shape[-1])
    scale = np.max(np.abs(ref))
    err = np.max(np.abs(out - ref))
    assert err <= 2e-2 * scale + 1e-3, (err, scale)


def test_stage2_pallas_band_decomposition_bitexact():
    """Different halo decompositions must agree bit-for-bit (edge rows
    exercise entry-conv and bottleneck-3x3 zero padding across bands)."""
    _, bparams, bstats, y1 = _init_stage2(0.5, seed=3, h4=32, w2=16)
    wts = stage2_fused_weights(bparams, bstats)
    a = np.asarray(stage2_fold_pallas(y1, wts, interpret=INTERP, band=4),
                   np.float32)
    b = np.asarray(stage2_fold_pallas(y1, wts, interpret=INTERP, band=16),
                   np.float32)
    np.testing.assert_array_equal(a, b)


def test_stage2_pallas_single_block_variant():
    """deepen_factor small enough for one bottleneck (nb=1) — the halo
    logic must follow nb."""
    st2, bparams, bstats, y1 = _init_stage2(0.5, seed=4, h4=16, w2=16,
                                            df=0.112)
    assert 'blocks_1' not in bparams['stage2']['csp']
    ref = np.asarray(_xla_stage2_folded(st2, bparams, bstats, y1),
                     np.float32)
    wts = stage2_fused_weights(bparams, bstats)
    out = np.asarray(stage2_fold_pallas(y1, wts, interpret=INTERP, band=2),
                     np.float32)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(out - ref)) <= 2e-2 * scale + 1e-3


def test_stage2_pallas_vmap_matches_loop():
    _, bparams, bstats, y1 = _init_stage2(0.5, seed=5)
    wts = stage2_fused_weights(bparams, bstats)
    ys = jnp.stack([y1, y1 * jnp.bfloat16(0.5)])
    batched = jax.vmap(lambda a: stage2_fold_pallas(
        a, wts, interpret=INTERP))(ys)
    for i in range(2):
        one = stage2_fold_pallas(ys[i], wts, interpret=INTERP)
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(one))


def test_unfold_w_roundtrip():
    rng = np.random.RandomState(0)
    std = rng.randn(3, 4, 10, 6).astype(np.float32)
    folded = std.reshape(3, 4, 5, 2, 6).reshape(3, 4, 5, 12)
    np.testing.assert_array_equal(np.asarray(unfold_w(jnp.asarray(folded))),
                                  std)


def test_full_program_stage2_pallas_matches_xla():
    """Full detector forward with both fused kernels ('stage2_out' entry)
    vs the packed-stem XLA path: same parameters, head outputs must agree
    (bf16 rounding only); and the full per-frame MOT program runs
    end-to-end with stage2_backend='pallas'."""
    from stereotracking_tpu.models import tracker as trk
    from stereotracking_tpu.models.mot import MOTConfig, predict_frame_raw
    from stereotracking_tpu.models.preprocessor import preprocess_frame_pure
    from stereotracking_tpu.ops.stage1_pallas import pallas_stage1_out
    from stereotracking_tpu.ops.stage2_pallas import pallas_stage2_out
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 64, 96
    cfg = MOTConfig(stem_backend='pallas', stage1_backend='pallas',
                    stage2_backend='pallas')
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
    y2 = pallas_stage2_out(ms.variables['params']['backbone'],
                           ms.variables['batch_stats']['backbone'],
                           y1, interpret=INTERP)
    out = ms.module.apply(ms.variables, {**inputs, 'stage2_out': y2},
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


def test_builder_stage2_backend_key():
    from stereotracking_tpu.apis.builder import build_mot_config
    cfg = build_mot_config({'type': 'OCSORT_Disparity',
                            'stem_backend': 'pallas',
                            'stage1_backend': 'pallas',
                            'stage2_backend': 'pallas'})
    assert cfg.stage2_backend == 'pallas'
    assert build_mot_config({'type': 'OCSORT_Disparity'}).stage2_backend \
        == 'xla'
