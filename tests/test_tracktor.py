"""Tracktor fixed-slot tracker behavior (reference:
mmtrack/models/trackers/tracktor_tracker.py:49-272)."""
import jax.numpy as jnp
import numpy as np

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
