"""Tracktor fixed-slot tracker behavior (reference:
mmtrack/models/trackers/tracktor_tracker.py:49-272)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.tracktor import (
    TracktorConfig, TracktorState, init_state, tracktor_step)

CFG = TracktorConfig(num_slots=4, embed_dim=4, num_samples=3)
K = CFG.num_slots


def _reg(boxes=None, scores=None):
    b = jnp.zeros((K, 4)) if boxes is None else jnp.asarray(boxes)
    s = jnp.zeros((K,)) if scores is None else jnp.asarray(scores)
    return b, s


def _dets(boxes, scores, embeds=None):
    boxes = jnp.asarray(boxes, jnp.float32).reshape(-1, 4)
    n = len(boxes)
    e = jnp.zeros((n, CFG.embed_dim)) if embeds is None \
        else jnp.asarray(embeds, jnp.float32)
    return (boxes, jnp.asarray(scores, jnp.float32),
            jnp.zeros(n, jnp.int32), e, jnp.ones(n, bool))


def test_first_frame_new_ids():
    st = init_state(CFG)
    rb, rs = _reg()
    st, (ob, os_, ol, oi, ov) = tracktor_step(
        st, rb, rs, *_dets([[10, 10, 50, 50]], [0.9]),
        jnp.zeros((K, CFG.embed_dim)), 0, CFG)
    oi = np.asarray(oi)[np.asarray(ov).astype(bool)]
    assert list(oi) == [0]
    assert int(st.valid.sum()) == 1


def test_regression_propagates_id_and_suppresses_duplicate_det():
    st = init_state(CFG)
    rb, rs = _reg()
    st, _ = tracktor_step(st, rb, rs, *_dets([[10, 10, 50, 50]], [0.9]),
                          jnp.zeros((K, CFG.embed_dim)), 0, CFG)
    slot = int(np.argmax(np.asarray(st.valid)))
    # frame 1: the regressed box for that slot is confident; a detection
    # overlapping it must be dropped (:196-201)
    rb = jnp.zeros((K, 4)).at[slot].set(jnp.asarray([12., 10., 52., 50.]))
    rs = jnp.zeros((K,)).at[slot].set(0.95)
    st, (ob, os_, ol, oi, ov) = tracktor_step(
        st, rb, rs, *_dets([[13, 10, 53, 50]], [0.9]),
        jnp.zeros((K, CFG.embed_dim)), 1, CFG)
    ov = np.asarray(ov).astype(bool)
    oi = np.asarray(oi)
    assert list(oi[ov]) == [0]          # only the propagated track
    np.testing.assert_allclose(np.asarray(ob)[ov][0],
                               [12., 10., 52., 50.])


def test_reid_reactivation_requires_overlap_and_distance():
    st = init_state(CFG)
    rb, rs = _reg()
    e = [[1., 0., 0., 0.]]
    st, _ = tracktor_step(st, rb, rs,
                          *_dets([[10, 10, 50, 50]], [0.9], e),
                          jnp.zeros((K, CFG.embed_dim)), 0, CFG)
    # frame 1: regression fails (low score) -> track lost; an overlapping
    # det with the same embedding re-activates id 0
    st, (ob, os_, ol, oi, ov) = tracktor_step(
        st, rb, rs, *_dets([[12, 10, 52, 50]], [0.9], e),
        jnp.zeros((K, CFG.embed_dim)), 1, CFG)
    oi = np.asarray(oi)[np.asarray(ov).astype(bool)]
    assert list(oi) == [0]


def test_reid_blocked_by_low_iou():
    st = init_state(CFG)
    rb, rs = _reg()
    e = [[1., 0., 0., 0.]]
    st, _ = tracktor_step(st, rb, rs,
                          *_dets([[10, 10, 50, 50]], [0.9], e),
                          jnp.zeros((K, CFG.embed_dim)), 0, CFG)
    # same appearance but far away (IoU 0 < 0.2) -> new id (:222-227)
    st, (ob, os_, ol, oi, ov) = tracktor_step(
        st, rb, rs, *_dets([[200, 10, 240, 50]], [0.9], e),
        jnp.zeros((K, CFG.embed_dim)), 1, CFG)
    oi = np.asarray(oi)[np.asarray(ov).astype(bool)]
    assert list(oi) == [1]


@pytest.mark.skipif(os.environ.get('STTPU_SLOW_TESTS') != '1',
                    reason='full streaming model is compile-heavy')
def test_tracktor_streaming_end_to_end():
    from stereotracking_tpu.models.reid import BaseReID
    from stereotracking_tpu.models.tracktor import TracktorStreaming
    from stereotracking_tpu.models.two_stage import (FasterRCNN,
                                                     TwoStageConfig)
    det_cfg = TwoStageConfig(num_classes=1, anchor_scales=(4, 8),
                             rpn_nms_pre=64, num_proposals=16,
                             rcnn_max_per_img=8)
    fr = FasterRCNN(det_cfg)
    fv = fr.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 96, 3)))
    reid = BaseReID(embed_dim=32, num_classes=1)
    rv = reid.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 16, 3)))
    cfg = TracktorConfig(num_slots=8, embed_dim=32, num_samples=3)
    tr = TracktorStreaming(fv, rv, det_cfg, cfg, input_shape=(64, 96),
                           reid_hw=(32, 16), num_dets=8)
    rng = np.random.RandomState(0)
    for f in range(2):
        out = tr.track(jnp.asarray(rng.rand(1, 64, 96, 3) * 255,
                                   jnp.float32), f)
        assert np.isfinite(np.asarray(out['bboxes'])).all()
        assert out['bboxes'].shape[0] == 16
