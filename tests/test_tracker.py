"""OC-SORT tracker tests: deterministic synthetic scenarios + oracle A/B."""
from functools import partial

import jax
import numpy as np
import pytest

from oracle_tracker import OracleTracker
from stereotracking_tpu.models import tracker as T


CFG = T.TrackerConfig(num_slots=16, num_dets=16)


def make_dets(boxes, scores, labels=None, scales=None, depths=None,
              cfg=CFG):
    n = cfg.num_dets
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    m = len(boxes)
    assert m <= n
    pad = lambda a, fill: np.concatenate(
        [np.asarray(a, np.float32), np.full(n - m, fill, np.float32)])
    b = np.zeros((n, 4), np.float32)
    b[:m] = boxes
    labels = np.zeros(m) if labels is None else labels
    scales = np.ones(m) if scales is None else scales
    depths = np.full(m, 10.0) if depths is None else depths
    return T.Detections(
        bboxes=b, scores=pad(scores, 0.0),
        labels=pad(labels, 0).astype(np.int32),
        scales=pad(scales, 1.0), depths=pad(depths, -1.0),
        valid=np.arange(n) < m)


@partial(jax.jit, static_argnames='cfg')
def jit_step(state, dets, frame, cfg):
    return T.step(state, dets, frame, cfg)


def run_sequence(frames, cfg=CFG):
    """frames: list of (boxes, scores) -> list of {id: box} dicts."""
    state = T.init_state(cfg)
    outs = []
    for f, (boxes, scores) in enumerate(frames):
        dets = make_dets(boxes, scores, cfg=cfg)
        state, out = jit_step(state, dets, f, cfg)
        ids = np.asarray(out.ids)
        valid = np.asarray(out.valid)
        bxs = np.asarray(out.bboxes)
        outs.append({int(i): bxs[j] for j, i in enumerate(ids) if valid[j]})
    return outs, state


def linear_boxes(t, x0, y0, vx, vy, w=40, h=30):
    x = x0 + vx * t
    y = y0 + vy * t
    return [x, y, x + w, y + h]


def test_two_objects_keep_ids():
    frames = []
    for t in range(10):
        frames.append((
            [linear_boxes(t, 100, 100, 5, 0),
             linear_boxes(t, 500, 300, -4, 2)],
            [0.9, 0.85]))
    outs, _ = run_sequence(frames)
    assert set(outs[0].keys()) == {0, 1}
    for f in outs:
        assert set(f.keys()) == {0, 1}
    # identity follows geometry
    for t, f in enumerate(outs):
        np.testing.assert_allclose(
            f[0], linear_boxes(t, 100, 100, 5, 0), atol=1e-3)


def test_low_score_det_not_initialized():
    # score between obj_score_thr and init_track_thr on frame 0 -> no track
    outs, state = run_sequence([([[10, 10, 60, 50]], [0.5])])
    assert outs[0] == {}
    assert int(np.asarray(state.num_tracks)) == 0


def test_tentative_track_confirms_after_three_hits():
    frames = []
    for t in range(6):
        dets = [linear_boxes(t, 100, 100, 5, 0)]
        scores = [0.9]
        if t >= 2:
            dets.append(linear_boxes(t - 2, 400, 200, 3, 1))
            scores.append(0.8)
        frames.append((dets, scores))
    outs, state = run_sequence(frames)
    # second object appears at frame 2 -> new id 1, stays
    assert 1 in outs[2] and 1 in outs[5]
    active = np.asarray(state.active)
    tentative = np.asarray(state.tentative)
    assert active.sum() == 2
    assert not tentative[active].any()


def test_tentative_evicted_when_unmatched():
    frames = [
        ([linear_boxes(0, 100, 100, 5, 0)], [0.9]),
        ([linear_boxes(1, 100, 100, 5, 0),
          [700, 500, 740, 530]], [0.9, 0.8]),   # spurious det -> tentative
        ([linear_boxes(2, 100, 100, 5, 0)], [0.9]),  # spurious gone
        ([linear_boxes(3, 100, 100, 5, 0)], [0.9]),
    ]
    outs, state = run_sequence(frames)
    assert 1 in outs[1]
    # tentative track evicted -> only one active slot
    assert int(np.asarray(state.active).sum()) == 1
    assert 0 in outs[3]


def test_ocr_recovers_lost_track_same_id():
    frames = []
    for t in range(12):
        if 4 <= t <= 6:
            frames.append(([], []))  # full dropout
        else:
            frames.append(([linear_boxes(t, 100, 100, 0, 0)], [0.9]))
    outs, _ = run_sequence(frames)
    assert 0 in outs[3]
    assert outs[4] == {}
    # stationary object recovered with the same id, not a new one
    assert 0 in outs[7]
    assert 1 not in outs[7]


def test_track_evicted_after_retention():
    cfg = CFG._replace(num_frames_retain=5)
    frames = [([linear_boxes(0, 100, 100, 0, 0)], [0.9])]
    for _ in range(7):
        frames.append(([[600, 400, 640, 430]], [0.9]))
    outs, state = run_sequence(frames, cfg)
    ids = np.asarray(state.ids)[np.asarray(state.active)]
    assert 0 not in ids  # first track evicted after 5 missed frames


# ---------------------------------------------------------------------------
# Oracle A/B
# ---------------------------------------------------------------------------

def simulate_world(seed, n_frames=25, n_obj=4, p_drop=0.15, p_spur=0.1):
    """Random linear walks with dropouts and spurious detections."""
    rng = np.random.RandomState(seed)
    x = rng.uniform(100, 1100, n_obj)
    y = rng.uniform(100, 600, n_obj)
    vx = rng.uniform(-6, 6, n_obj)
    vy = rng.uniform(-4, 4, n_obj)
    w = rng.uniform(25, 60, n_obj)
    h = rng.uniform(20, 50, n_obj)
    frames = []
    for t in range(n_frames):
        boxes, scores = [], []
        for i in range(n_obj):
            if rng.rand() < p_drop and t > 0:
                continue
            bx = x[i] + vx[i] * t + rng.uniform(-1.5, 1.5)
            by = y[i] + vy[i] * t + rng.uniform(-1.5, 1.5)
            boxes.append([bx, by, bx + w[i], by + h[i]])
            scores.append(float(rng.uniform(0.75, 0.95)))
        if rng.rand() < p_spur:
            bx, by = rng.uniform(100, 1100), rng.uniform(100, 600)
            boxes.append([bx, by, bx + 30, by + 25])
            scores.append(float(rng.uniform(0.35, 0.6)))
        frames.append((np.array(boxes, np.float32).reshape(-1, 4),
                       np.array(scores, np.float32)))
    return frames


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_ab_matches_oracle(seed):
    frames = simulate_world(seed)
    oracle = OracleTracker()
    state = T.init_state(CFG)
    for f, (boxes, scores) in enumerate(frames):
        exp = oracle.step(boxes, scores, np.zeros(len(boxes), int),
                          np.ones(len(boxes)), np.full(len(boxes), 10.0), f)
        dets = make_dets(boxes, scores)
        state, out = jit_step(state, dets, f, CFG)
        ids = np.asarray(out.ids)
        valid = np.asarray(out.valid)
        bxs = np.asarray(out.bboxes)
        got = {int(i): bxs[j] for j, i in enumerate(ids) if valid[j]}
        assert set(got.keys()) == set(exp.keys()), \
            f'frame {f}: ids {sorted(got)} vs oracle {sorted(exp)}'
        for tid, box in exp.items():
            np.testing.assert_allclose(got[tid], box, atol=1e-2,
                                       err_msg=f'frame {f} id {tid}')


@pytest.mark.parametrize('kwargs,seed', [
    (dict(num_tentatives=1), 5),
    (dict(num_frames_retain=5), 6),
    (dict(weight_iou_with_det_scores=True), 7),
    (dict(match_iou_thr=0.3), 8),
    (dict(vel_consist_weight=0.0), 9),
    (dict(vel_delta_t=1), 10),
    (dict(init_track_thr=0.5, obj_score_thr=0.2), 11),
])
def test_ab_matches_oracle_config_variants(kwargs, seed):
    """Oracle A/B across tracker hyperparameter variations."""
    cfg = CFG._replace(**kwargs)
    frames = simulate_world(seed, n_frames=30, n_obj=5, p_drop=0.25,
                            p_spur=0.25)
    oracle = OracleTracker(**kwargs)
    state = T.init_state(cfg)
    for f, (boxes, scores) in enumerate(frames):
        exp = oracle.step(boxes, scores, np.zeros(len(boxes), int),
                          np.ones(len(boxes)), np.full(len(boxes), 10.0), f)
        dets = make_dets(boxes, scores, cfg=cfg)
        state, out = jit_step(state, dets, f, cfg)
        ids = np.asarray(out.ids)
        valid = np.asarray(out.valid)
        bxs = np.asarray(out.bboxes)
        got = {int(i): bxs[j] for j, i in enumerate(ids) if valid[j]}
        assert set(got.keys()) == set(exp.keys()), \
            f'frame {f}: {sorted(got)} vs oracle {sorted(exp)} ({kwargs})'
        for tid, box in exp.items():
            np.testing.assert_allclose(got[tid], box, atol=1e-2,
                                       err_msg=f'frame {f} id {tid}')


@pytest.mark.parametrize('seed', [20, 21])
def test_ab_long_sequences_with_heavy_occlusion(seed):
    """60-frame sequences, high dropout: exercises OCR recovery + smoothing
    + retention eviction against the oracle."""
    frames = simulate_world(seed, n_frames=60, n_obj=6, p_drop=0.35,
                            p_spur=0.3)
    oracle = OracleTracker()
    state = T.init_state(CFG)
    for f, (boxes, scores) in enumerate(frames):
        exp = oracle.step(boxes, scores, np.zeros(len(boxes), int),
                          np.ones(len(boxes)), np.full(len(boxes), 10.0), f)
        dets = make_dets(boxes, scores)
        state, out = jit_step(state, dets, f, CFG)
        ids = np.asarray(out.ids)
        valid = np.asarray(out.valid)
        got = sorted(int(i) for j, i in enumerate(ids) if valid[j])
        assert got == sorted(exp.keys()), f'frame {f}'
