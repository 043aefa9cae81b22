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
    assert c['Frag'] == 1


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
