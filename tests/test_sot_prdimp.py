"""PrDiMP units: crop semantics, filter ops, label density, steepest-
descent optimizer behavior, localization states, memory recurrence.
(Reference: mmtrack/models/sot/prdimp.py,
mmtrack/models/filter/filter_optimizer.py,
mmtrack/models/track_heads/prdimp_cls_head.py.)"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.sot.prdimp import (
    HARD_NEGATIVE, NORMAL, NOT_FOUND, PrDiMPMemory, PrDiMPTestCfg,
    apply_feat_transpose, apply_filter, gen_label_density, localize_target,
    optimize_filter, prdimp_crop, update_memory)


def test_crop_inside_shift_keeps_window_in_image():
    img = jnp.ones((60, 80, 3))
    # box near the corner; 'inside' mode must shift the window in
    _, coord = prdimp_crop(img, jnp.asarray([2., 2., 10., 10.]), 4.0, 32,
                           inside=True)
    c = np.asarray(coord)
    assert c[0] - c[2] / 2 >= -1 and c[1] - c[3] / 2 >= -1


def test_apply_filter_and_transpose_are_adjoint():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(2, 10, 10, 4), jnp.float32)
    filt = jnp.asarray(rng.rand(4, 4, 4), jnp.float32)
    act = jnp.asarray(rng.rand(2, 11, 11), jnp.float32)
    # <apply_filter(feat, f), act> == <f, apply_feat_transpose(feat, act)>
    lhs = float((apply_filter(feat, filt) * act).sum())
    rhs = float((filt * apply_feat_transpose(feat, act, (4, 4))).sum())
    assert abs(lhs - rhs) < 1e-2 * max(abs(lhs), 1)


def test_label_density_normalized_and_centered():
    d = gen_label_density(jnp.asarray([[5., 7.]]), (11, 15), 0.9)
    d = np.asarray(d[0])
    assert abs(d.sum() - 1.0) < 1e-5
    assert np.unravel_index(d.argmax(), d.shape) == (5, 7)


def test_optimizer_reduces_kl_objective():
    """A few steepest-descent iterations must reduce the PrDiMP loss."""
    rng = np.random.RandomState(1)
    cfg = PrDiMPTestCfg(feat_stride=16, gauss_sigma=0.9)
    feat = jnp.asarray(rng.rand(3, 12, 12, 8), jnp.float32)
    bboxes = jnp.asarray([[96., 96., 40., 40.]] * 3, jnp.float32)
    w = jnp.full((3,), 1 / 3)
    filt0 = jnp.asarray(rng.rand(4, 4, 8) * 0.01, jnp.float32)

    def loss(f):
        raw = apply_filter(feat, f)
        n = raw.shape[0]
        centers = bboxes[:, :2] / cfg.feat_stride
        density = gen_label_density(centers[:, ::-1], raw.shape[1:],
                                    cfg.gauss_sigma)
        lse = jax.nn.logsumexp(raw.reshape(n, -1), -1)
        dot = (density * raw).sum(axis=(1, 2))
        return ((lse - dot) / 3).sum()

    f1 = optimize_filter(filt0, feat, bboxes, w, 5, cfg,
                         jnp.asarray(0.0), jnp.asarray(cfg.min_filter_regular))
    assert float(loss(f1)) < float(loss(filt0))


def test_localize_states():
    cfg = PrDiMPTestCfg()
    prev = jnp.asarray([100., 100., 30., 30.])
    center = jnp.asarray([100., 100.])
    # flat near-zero map -> not found
    low = jnp.full((18, 18), 0.001)
    _, st, _ = localize_target(low, prev, center, jnp.asarray(1.0), cfg)
    assert int(st) == NOT_FOUND
    # single sharp peak at the center -> normal
    peak = jnp.zeros((18, 18)).at[9, 9].set(1.0)
    c, st, sc = localize_target(peak, prev, center, jnp.asarray(1.0), cfg)
    assert int(st) == NORMAL and float(sc) == 1.0
    np.testing.assert_allclose(np.asarray(c), [100., 100.], atol=1e-4)
    # strong second peak far away -> hard negative or uncertain
    two = peak.at[2, 15].set(0.9)
    _, st, _ = localize_target(two, prev, center, jnp.asarray(1.0), cfg)
    assert int(st) in (HARD_NEGATIVE, 2)


def test_memory_update_recurrence():
    cfg = PrDiMPTestCfg(sample_memory_size=4, normal_lr=0.1)
    n_init = 2
    mem = PrDiMPMemory(
        jnp.zeros((4, 3, 3, 2)), jnp.zeros((4, 4)),
        jnp.zeros((4,)).at[:n_init].set(0.5),
        jnp.asarray(n_init), jnp.asarray(n_init), jnp.asarray(-1))
    feat = jnp.ones((3, 3, 2))
    mem = update_memory(mem, feat, jnp.asarray([1., 2., 3., 4.]), 0.1, cfg)
    w = np.asarray(mem.weights)
    # new sample occupies the first free slot with weight ~lr (normalized)
    assert int(mem.num_samples) == 3
    assert abs(w.sum() - 1.0) < 1e-5
    assert w[2] > 0
    # filling up: next goes to slot 3, then replacement picks the
    # lowest-weight NON-INIT slot
    mem = update_memory(mem, feat, jnp.zeros(4), 0.1, cfg)
    assert int(mem.num_samples) == 4
    mem2 = update_memory(mem, feat, jnp.zeros(4), 0.1, cfg)
    assert int(mem2.replace_ind) in (2, 3)
    # init samples keep at least init_samples_min_weight total
    w2 = np.asarray(mem2.weights)
    assert w2[:2].sum() >= cfg.init_samples_min_weight - 1e-5


@pytest.mark.skipif(os.environ.get('STTPU_SLOW_TESTS') != '1',
                    reason='full PrDiMP tracker is compile-heavy')
def test_prdimp_tracker_end_to_end():
    from stereotracking_tpu.models.sot.prdimp import (PrDiMPModule,
                                                      PrDiMPTracker)
    cfg = PrDiMPTestCfg(img_sample_size=128, sample_memory_size=10,
                        blur_sigmas=((2, 2),), dropout_probs=(0.2,),
                        init_update_iters=2, box_refine_iter=2,
                        num_init_random_boxes=3)
    m = PrDiMPModule(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
               jnp.asarray([[40., 40., 90., 90.]]))
    trk = PrDiMPTracker(v, cfg)
    frame = jnp.asarray(np.random.RandomState(3).rand(240, 320, 3) * 255,
                        jnp.float32)
    st = trk.init(frame, [100., 80., 160., 140.])
    st, (bb, score) = trk.track(frame, st, np.random.RandomState(4))
    assert np.isfinite(np.asarray(bb)).all()


def test_cls_train_loss_unrolled_decreases_with_iters():
    """More optimizer iterations must not worsen the final-iterate KL
    objective on a fixed problem (training-surface sanity)."""
    from stereotracking_tpu.models.sot.prdimp import prdimp_cls_train_loss
    rng = np.random.RandomState(0)
    cfg = PrDiMPTestCfg()
    feat = jnp.asarray(rng.rand(2, 12, 12, 8), jnp.float32)
    bboxes = jnp.asarray([[96., 96., 40., 40.]] * 2, jnp.float32)
    f0 = jnp.asarray(rng.rand(4, 4, 8) * 0.01, jnp.float32)
    l1 = float(prdimp_cls_train_loss(f0, feat, bboxes, 1, cfg,
                                     jnp.asarray(0.0), jnp.asarray(0.05)))
    assert np.isfinite(l1)
    # gradient flows back to the initial filter (meta-learning signal)
    g = jax.grad(lambda f: prdimp_cls_train_loss(
        f, feat, bboxes, 2, cfg, jnp.asarray(0.0),
        jnp.asarray(0.05)))(f0)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_gmm_proposals_and_kl_mc_loss():
    from stereotracking_tpu.models.sot.prdimp import (kl_mc_loss,
                                                      sample_gmm_proposals)
    gt = jnp.asarray([10., 20., 40., 30.])
    props, q, p = sample_gmm_proposals(gt, jax.random.PRNGKey(0),
                                      num_samples=64)
    assert props.shape == (64, 4)
    assert (np.asarray(q) > 0).all()
    # proposals concentrate around the gt box
    centers = np.asarray(props[:, :2] + props[:, 2:] / 2)
    assert abs(centers.mean(0)[0] - 30) < 15

    # scoring the gt density ratio perfectly gives a lower loss than a
    # constant predictor
    s_good = jnp.log(jnp.maximum(p, 1e-12))[None]
    s_flat = jnp.zeros_like(s_good)
    l_good = float(kl_mc_loss(s_good, q[None], p[None]))
    l_flat = float(kl_mc_loss(s_flat, q[None], p[None]))
    assert l_good < l_flat
