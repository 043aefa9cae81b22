"""Evaluation metric tests: hand-computed golden cases."""
import numpy as np
import pytest

from stereotracking_tpu.evaluation import (CocoMAPEvaluator, MOTDroneMetrics,
                                           VideoData, clear_metrics,
                                           hota_metrics, identity_metrics)


def _box(x, y, w=10, h=10):
    return [x, y, x + w, y + h]


def perfect_video(n_frames=10, n_obj=2):
    gt, pred = {}, {}
    for f in range(n_frames):
        ids = np.arange(n_obj)
        boxes = np.array([_box(100 * i + 3 * f, 50) for i in range(n_obj)],
                         float)
        gt[f] = (ids, boxes)
        pred[f] = (ids + 10, boxes.copy())
    return gt, pred


def test_perfect_tracking_scores_one():
    gt, pred = perfect_video()
    data = VideoData(gt, pred)
    c = clear_metrics(data)
    assert c['MOTA'] == pytest.approx(1.0)
    assert c['MOTP'] == pytest.approx(1.0)
    assert c['IDSW'] == 0
    assert c['MT'] == 2 and c['ML'] == 0
    i = identity_metrics(data)
    assert i['IDF1'] == pytest.approx(1.0)
    h = hota_metrics(data)
    assert h['HOTA'] == pytest.approx(1.0, abs=1e-6)


def test_id_switch_counted():
    gt, pred = perfect_video(n_frames=10, n_obj=1)
    # switch predicted id halfway
    for f in range(5, 10):
        ids, boxes = pred[f]
        pred[f] = (ids + 99, boxes)
    data = VideoData(gt, pred)
    c = clear_metrics(data)
    assert c['IDSW'] == 1
    assert c['MOTA'] == pytest.approx(1.0 - 1 / 10)
    i = identity_metrics(data)
    # best identity match covers 5 of 10 frames
    assert i['IDF1'] == pytest.approx(0.5)
    h = hota_metrics(data)
    # DetA perfect, AssA = 5/10 jaccard-ish (both fragments: 5/(10+5-5)=0.5)
    assert h['DetA'] == pytest.approx(1.0, abs=1e-6)
    assert h['AssA'] == pytest.approx(0.5, abs=1e-6)


def test_false_positives_and_misses():
    gt, pred = perfect_video(n_frames=4, n_obj=1)
    # drop frame 1 pred, add a spurious far box frame 2
    pred[1] = (np.zeros(0, int), np.zeros((0, 4)))
    ids, boxes = pred[2]
    pred[2] = (np.array([int(ids[0]), 500]),
               np.vstack([boxes, [_box(900, 400)]]))
    data = VideoData(gt, pred)
    c = clear_metrics(data)
    assert c['CLR_FN'] == 1 and c['CLR_FP'] == 1
    assert c['MOTA'] == pytest.approx(1.0 - 2 / 4)
    # TrackEval skips timesteps with no tracker dets without clearing the
    # previous-timestep match memory, so the re-match at frame 2 continues
    # the frame-0 segment: no fragmentation (trackeval clear.py semantics).
    assert c['Frag'] == 0


# ---------------------------------------------------------------------------
# TrackEval-semantics certification fixtures (VERDICT r1 item 4): expected
# values hand-derived from the TrackEval algorithm spec (clear.py /
# identity.py / hota.py eval_sequence + combine_sequences).
# ---------------------------------------------------------------------------

def _seq(frames):
    """frames: list of (gt_ids, pred_ids) with unit boxes at id-specific
    disjoint locations; same id <-> IoU 1, different ids IoU 0."""
    gt, pred = {}, {}
    for f, (gids, pids) in enumerate(frames):
        gt[f] = (np.asarray(gids, int),
                 np.array([_box(200 * g, 0) for g in gids], float
                          ).reshape(-1, 4))
        pred[f] = (np.asarray(pids, int),
                   np.array([_box(200 * (p % 100), 0) for p in pids], float
                            ).reshape(-1, 4))
    return gt, pred


def test_certify_hota_cross_sequence_pooling():
    """Fixture A. v1: perfect 4 frames. v2: pred id switch at frame 2.

    Hand derivation: v1 per-alpha TP=4, AssA=1, DetA=1. v2 TP=4, DetA=1;
    match counts 2+2 with gt_count 4 -> ass_iou 2/(4+2-2)=0.5 -> AssA=0.5.
    Pooled (TrackEval combine_sequences): DetA=1, AssA=(4*1+4*0.5)/8=0.75,
    HOTA = sqrt(0.75) = 0.8660254 -- NOT the det-weighted mean of
    per-sequence HOTA values (= 0.8535534), which is the bug this pins.
    """
    from stereotracking_tpu.evaluation.clear_identity_hota import \
        combine_videos
    v1 = VideoData(*_seq([([0], [100])] * 4))
    # id 100 maps to gt 0's location; switch to 200 (also location 0: %100)
    v2 = VideoData(*_seq([([0], [100])] * 2 + [([0], [200])] * 2))
    agg = combine_videos([v1, v2])
    assert agg['DetA'] == pytest.approx(1.0, abs=1e-9)
    assert agg['AssA'] == pytest.approx(0.75, abs=1e-9)
    assert agg['HOTA'] == pytest.approx(np.sqrt(0.75), abs=1e-9)
    assert agg['HOTA'] != pytest.approx(0.8535534, abs=1e-4)
    # CLEAR/Identity pooling on the same fixture
    assert agg['IDSW'] == 1
    assert agg['MOTA'] == pytest.approx(1.0 - 1 / 8)
    assert agg['IDF1'] == pytest.approx(0.75)


def test_certify_empty_frame_continuation():
    """Fixture B: 1 gt over 3 frames, pred present frames 0 and 2 only.

    TrackEval skips the no-pred frame (FN += 1, gt count += 1) WITHOUT
    resetting the previous-timestep match memory, so frame 2 continues the
    frame-0 segment: Frag=0, IDSW=0. MOTA = 1 - 1/3; ratio 2/3 -> PT.
    Identity: IDTP=2, IDFN=1, IDFP=0 -> IDF1 = 2/2.5 = 0.8.
    HOTA: TP=2, FN=1, FP=0 -> DetA=2/3; ass_iou = 2/(3+2-2) = 2/3 = AssA;
    HOTA = sqrt(4/9) = 2/3.
    """
    gt, pred = _seq([([0], [100]), ([0], []), ([0], [100])])
    data = VideoData(gt, pred)
    c = clear_metrics(data)
    assert c['Frag'] == 0 and c['IDSW'] == 0
    assert c['CLR_FN'] == 1 and c['CLR_TP'] == 2
    assert c['MOTA'] == pytest.approx(1 - 1 / 3)
    assert (c['MT'], c['PT'], c['ML']) == (0, 1, 0)
    i = identity_metrics(data)
    assert i['IDF1'] == pytest.approx(0.8)
    h = hota_metrics(data)
    assert h['DetA'] == pytest.approx(2 / 3, abs=1e-9)
    assert h['AssA'] == pytest.approx(2 / 3, abs=1e-9)
    assert h['HOTA'] == pytest.approx(2 / 3, abs=1e-9)


def test_certify_mt_ml_thresholds_and_frag():
    """Fixture C: 5 frames; A matched 4/5 (ratio 0.8 -> PT under
    TrackEval's strict ``> 0.8``), B matched frames 0 and 4 only
    (ratio 0.4 -> PT; gap frames ARE processed because other preds exist,
    so B fragments once), C never matched (ML), D matched 5/5 (MT).
    TP=11, FN=9, FP=0, IDSW=0 -> MOTA = 1 - 9/20 = 0.55.
    """
    frames = []
    for f in range(5):
        pids = [103]                      # D always tracked
        if f <= 3:
            pids.append(100)              # A frames 0-3
        if f in (0, 4):
            pids.append(101)              # B frames 0 and 4
        frames.append(([0, 1, 2, 3], pids))
    data = VideoData(*_seq(frames))
    c = clear_metrics(data)
    assert c['CLR_TP'] == 11 and c['CLR_FN'] == 9 and c['CLR_FP'] == 0
    assert c['MOTA'] == pytest.approx(0.55)
    assert (c['MT'], c['PT'], c['ML']) == (1, 2, 1)
    assert c['Frag'] == 1 and c['IDSW'] == 0


def test_depth_filter_removes_far_objects():
    m = MOTDroneMetrics(depth_thr=80.0)
    ids = np.array([0, 1])
    boxes = np.array([_box(0, 0), _box(100, 0)], float)
    for f in range(3):
        m.process_frame('v', f,
                        gt_ids=ids, gt_bboxes=boxes,
                        gt_depths=np.array([40.0, 120.0]),   # second beyond
                        pred_ids=ids, pred_bboxes=boxes,
                        pred_depths=np.array([40.0, 120.0]))
    res = m.evaluate()
    # the >80m object is filtered from both sides -> perfect on the rest
    assert res['MOTA'] == pytest.approx(1.0)
    assert res['CLR_TP'] == 3


def test_mot_txt_roundtrip(tmp_path):
    m = MOTDroneMetrics(depth_thr=80.0, outfile_dir=str(tmp_path))
    m.process_frame('vid1', 0, np.array([1]), np.array([_box(5, 6)]),
                    np.array([10.0]), np.array([2]),
                    np.array([_box(5, 6)]), np.array([10.0]))
    m.dump_txt()
    pred = (tmp_path / 'vid1.txt').read_text().strip().split(',')
    assert pred[0] == '1' and pred[1] == '2'
    assert float(pred[2]) == 5.0 and float(pred[4]) == 10.0
    gt = (tmp_path / 'gt' / 'vid1' / 'gt.txt').read_text()
    assert gt.startswith('1,1,5')


def test_coco_map_perfect_and_degraded():
    ev = CocoMAPEvaluator(num_classes=1)
    for img in range(3):
        gts = np.array([_box(10, 10, 40, 30), _box(100, 50, 30, 30)], float)
        ev.add_gt(img, gts, [0, 0])
        ev.add_dt(img, gts, [0.9, 0.8], [0, 0])
    res = ev.evaluate()
    assert res['mAP'] == pytest.approx(1.0)
    assert res['mAP_50'] == pytest.approx(1.0)

    ev = CocoMAPEvaluator(num_classes=1)
    gts = np.array([_box(10, 10, 40, 30)], float)
    ev.add_gt(0, gts, [0])
    # detection shifted: IoU ~ 0.53 -> TP at low thresholds only
    ev.add_dt(0, np.array([_box(20, 10, 40, 30)]), [0.9], [0])
    res = ev.evaluate()
    assert res['mAP_50'] == pytest.approx(1.0)
    assert res['mAP_75'] == pytest.approx(0.0)
    assert 0.0 < res['mAP'] < 1.0


def test_coco_map_false_positive_penalty():
    ev = CocoMAPEvaluator(num_classes=1)
    gts = np.array([_box(10, 10, 40, 30)], float)
    ev.add_gt(0, gts, [0])
    # higher-scored FP before the TP halves AP (precision envelope)
    ev.add_dt(0, np.vstack([np.array(_box(500, 300, 20, 20)), gts]),
              [0.95, 0.9], [0, 0])
    res = ev.evaluate()
    assert res['mAP_50'] == pytest.approx(0.5, abs=0.01)
