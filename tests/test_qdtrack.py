"""QDTrack: bisoftmax tracker behavior and contrastive losses
(reference: mmtrack/models/trackers/quasi_dense_tracker.py,
mmtrack/models/track_heads/quasi_dense_embed_head.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.qdtrack import (
    QDTrackConfig, QuasiDenseEmbedHead, init_state, multi_pos_cross_entropy,
    qdtrack_aux_loss, qdtrack_step)

CFG = QDTrackConfig(num_slots=8, num_backdrops=4, embed_dim=4)


def _dets(boxes, scores, labels=None, embeds=None):
    boxes = jnp.asarray(boxes, jnp.float32).reshape(-1, 4)
    n = len(boxes)
    labels = jnp.zeros(n, jnp.int32) if labels is None \
        else jnp.asarray(labels, jnp.int32)
    embeds = jnp.asarray(embeds, jnp.float32) if embeds is not None \
        else jnp.eye(n, CFG.embed_dim)
    return (boxes, jnp.asarray(scores, jnp.float32), labels, embeds,
            jnp.ones(n, bool))


def test_init_and_continue_by_embedding():
    st = init_state(CFG)
    e = [[5., 0., 0., 0.]]
    st, ids = qdtrack_step(st, *_dets([[10, 10, 50, 50]], [0.9], embeds=e),
                           0, CFG)
    assert list(np.asarray(ids)) == [0]
    st, ids = qdtrack_step(st, *_dets([[60, 10, 100, 50]], [0.9], embeds=e),
                           1, CFG)
    assert list(np.asarray(ids)) == [0]
    assert int(st.num_tracks) == 1


def test_low_score_cannot_initialize():
    st = init_state(CFG)
    st, ids = qdtrack_step(st, *_dets([[10, 10, 50, 50]], [0.6]), 0, CFG)
    # 0.6 > obj thr but below init thr 0.8 -> no track
    assert list(np.asarray(ids)) == [-1]
    assert int(st.valid.sum()) == 0


def test_intra_frame_dedup_backdrop_thr():
    """A low-score det overlapping a higher-score one above 0.3 IoU is
    removed (tracker :243-255)."""
    st = init_state(CFG)
    boxes = [[10, 10, 50, 50], [12, 12, 52, 52]]
    st, ids = qdtrack_step(st, *_dets(boxes, [0.9, 0.4]), 0, CFG)
    ids = np.asarray(ids)
    assert ids[0] == 0 and ids[1] == -1
    # only one backdrop (the suppressed det is gone entirely)
    assert int(st.bd_valid.sum()) == 0


def test_unmatched_det_becomes_backdrop():
    st = init_state(CFG)
    boxes = [[10, 10, 50, 50], [200, 10, 240, 50]]
    # second det below init thr -> backdrop
    st, ids = qdtrack_step(st, *_dets(boxes, [0.9, 0.6]), 0, CFG)
    assert int(st.bd_valid.sum()) == 1


def test_track_expires_after_retention():
    st = init_state(CFG)
    e = [[5., 0., 0., 0.]]
    st, _ = qdtrack_step(st, *_dets([[10, 10, 50, 50]], [0.9], embeds=e),
                         0, CFG)
    empty = (jnp.zeros((1, 4)), jnp.zeros(1), jnp.zeros(1, jnp.int32),
             jnp.zeros((1, CFG.embed_dim)), jnp.zeros(1, bool))
    st2 = st
    for f in range(1, CFG.memo_tracklet_frames + 1):
        st2, _ = qdtrack_step(st2, *empty, f, CFG)
    assert int(st2.valid.sum()) == 0


def test_multi_pos_cross_entropy_behavior():
    # perfect separation -> small loss; inverted -> large loss
    sim_good = jnp.asarray([[10.0, -10.0]])
    sim_bad = jnp.asarray([[-10.0, 10.0]])
    pos = jnp.asarray([[True, False]])
    valid = jnp.ones((1, 2), bool)
    lg = float(multi_pos_cross_entropy(sim_good, pos, valid))
    lb = float(multi_pos_cross_entropy(sim_bad, pos, valid))
    assert lg < 1e-6 and lb > 10


def test_aux_loss_zero_for_ideal_embeddings():
    k = jnp.asarray([[1., 0.], [0., 1.]])
    r = jnp.asarray([[1., 0.], [0., 1.]])
    pos = jnp.eye(2, dtype=bool)
    valid = jnp.ones((2, 2), bool)
    assert float(qdtrack_aux_loss(k, r, pos, valid)) < 1e-6


def test_embed_head_shape_and_grads():
    h = QuasiDenseEmbedHead(conv_channels=8, fc_dim=16, embed_channels=4)
    x = jnp.zeros((3, 7, 7, 8))
    v = h.init(jax.random.PRNGKey(0), x)
    out = h.apply(v, x)
    assert out.shape == (3, 4)


def test_multi_pos_cross_entropy_large_sims_stable():
    """Unnormalized dot-product similarities reach hundreds early in
    training; the loss must stay finite (softplus form)."""
    sim = jnp.asarray([[500.0, -400.0], [300.0, 900.0]])
    pos = jnp.asarray([[True, False], [False, True]])
    valid = jnp.ones_like(pos)
    val = float(multi_pos_cross_entropy(sim, pos, valid))
    assert np.isfinite(val)
    # swapped positives -> the loss must be large but finite
    val2 = float(multi_pos_cross_entropy(sim, ~pos, valid))
    assert np.isfinite(val2) and val2 > val


@pytest.mark.skipif(os.environ.get('STTPU_SLOW_TESTS') != '1',
                    reason='full QDTrack train step is compile-heavy')
def test_qdtrack_train_loss_decreases():
    import optax
    from stereotracking_tpu.models.qdtrack import (QDTrackModule,
                                                   qdtrack_train_loss_fn)
    m = QDTrackModule(num_classes=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    params = v['params']
    rest = {k: x for k, x in v.items() if k != 'params'}
    loss_fn = qdtrack_train_loss_fn(m, num_rois=16)
    tx = optax.chain(optax.clip_by_global_norm(35.0),
                     optax.sgd(1e-4, momentum=0.9))
    opt = tx.init(params)

    @jax.jit
    def step(params, rest, opt, batch, key):
        (total, (losses, upd)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params, rest, batch, key)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), {**rest, **upd}, opt, total

    rng = np.random.RandomState(0)
    batch = dict(
        img=jnp.asarray(rng.rand(1, 64, 96, 3) * 255, jnp.float32),
        ref_img=jnp.asarray(rng.rand(1, 64, 96, 3) * 255, jnp.float32),
        gt_bboxes=jnp.asarray([[10, 10, 40, 40], [50, 20, 80, 50],
                               [0, 0, 1, 1], [0, 0, 1, 1]], jnp.float32),
        gt_labels=jnp.asarray([0, 1, 0, 0], jnp.int32),
        gt_ids=jnp.asarray([5, 9, -1, -1], jnp.int32),
        gt_valid=jnp.asarray([True, True, False, False]),
        ref_gt_bboxes=jnp.asarray([[12, 12, 42, 42], [52, 22, 82, 52],
                                   [0, 0, 1, 1], [0, 0, 1, 1]],
                                  jnp.float32),
        ref_gt_ids=jnp.asarray([5, 9, -1, -1], jnp.int32),
        ref_gt_valid=jnp.asarray([True, True, False, False]))
    t0 = None
    for i in range(4):
        params, rest, opt, total = step(params, rest, opt, batch,
                                        jax.random.PRNGKey(i))
        tv = float(total)
        assert np.isfinite(tv)
        if t0 is None:
            t0 = tv
    assert tv < t0
