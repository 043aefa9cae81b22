"""KITTI devkit-protocol evaluation tests with hand-computed expectations.

Protocol rules under test (reference: TrackEval Kitti2DBox semantics, used
by /root/reference/mmtrack/evaluation/metrics/mot_kitti_metrics.py via
/root/reference/mmtrack/evaluation/functional/kitti_2d_box.py:56-58,188-198):
neighboring-class distractors (van for car, person for pedestrian),
occlusion > 2 / truncation > 0 / height < 25 GT ignores, tracker dets
matched to ignored GT removed, unmatched tracker dets > 50% inside a
DontCare region removed.
"""
import numpy as np

from stereotracking_tpu.evaluation.kitti_protocol import (
    KITTI_CLASS_IDS, KittiEvaluator, preprocess_frame)


def box(x, y, w, h):
    return [x, y, x + w, y + h]


CAR = KITTI_CLASS_IDS['car']
VAN = KITTI_CLASS_IDS['van']
PED = KITTI_CLASS_IDS['pedestrian']
PERSON = KITTI_CLASS_IDS['person']


def test_distractor_match_removed_not_fp():
    # one car GT + one van; preds on both. The van-matched pred must be
    # removed (not an FP), the van must not appear in GT.
    (gids, gboxes), (pids, pboxes) = preprocess_frame(
        'car',
        gt_ids=[1, 2], gt_boxes=[box(0, 0, 50, 50), box(200, 0, 50, 50)],
        gt_classes=[CAR, VAN], gt_occlusion=[0, 0], gt_truncation=[0, 0],
        pred_ids=[10, 11],
        pred_boxes=[box(0, 0, 50, 50), box(200, 0, 50, 50)],
        pred_classes=[CAR, CAR])
    assert list(gids) == [1]
    assert list(pids) == [10]


def test_occluded_truncated_small_gt_ignored():
    # occ=3 -> ignored; trunc=1 -> ignored; height 20 < 25 -> ignored;
    # preds matched to them are removed. The one clean GT+pred remains.
    (gids, _), (pids, _) = preprocess_frame(
        'car',
        gt_ids=[1, 2, 3, 4],
        gt_boxes=[box(0, 0, 50, 50), box(100, 0, 50, 50),
                  box(200, 0, 50, 50), box(300, 0, 50, 20)],
        gt_classes=[CAR] * 4,
        gt_occlusion=[0, 3, 0, 0], gt_truncation=[0, 0, 1, 0],
        pred_ids=[10, 11, 12, 13],
        pred_boxes=[box(0, 0, 50, 50), box(100, 0, 50, 50),
                    box(200, 0, 50, 50), box(300, 0, 50, 20)],
        pred_classes=[CAR] * 4)
    assert list(gids) == [1]
    assert list(pids) == [10]


def test_dontcare_swallows_unmatched_pred():
    # pred fully inside a DontCare region and unmatched -> removed;
    # a second unmatched pred far away stays (a real FP).
    (gids, _), (pids, _) = preprocess_frame(
        'car',
        gt_ids=[], gt_boxes=np.zeros((0, 4)), gt_classes=[],
        gt_occlusion=[], gt_truncation=[],
        pred_ids=[10, 11],
        pred_boxes=[box(10, 10, 30, 30), box(500, 0, 50, 50)],
        pred_classes=[CAR, CAR],
        dontcare=[box(0, 0, 100, 100)])
    assert list(pids) == [11]


def test_pedestrian_person_sitting_distractor():
    (gids, _), (pids, _) = preprocess_frame(
        'pedestrian',
        gt_ids=[1, 2], gt_boxes=[box(0, 0, 30, 60), box(100, 0, 30, 60)],
        gt_classes=[PED, PERSON], gt_occlusion=[0, 0], gt_truncation=[0, 0],
        pred_ids=[10, 11],
        pred_boxes=[box(0, 0, 30, 60), box(100, 0, 30, 60)],
        pred_classes=[PED, PED])
    assert list(gids) == [1]
    assert list(pids) == [10]


def test_other_class_gt_does_not_swallow():
    # a truck GT is irrelevant to car eval: a pred on it stays an FP
    # (it is neither matched-to-distractor nor in DontCare).
    (gids, _), (pids, _) = preprocess_frame(
        'car',
        gt_ids=[1], gt_boxes=[box(0, 0, 50, 50)],
        gt_classes=[KITTI_CLASS_IDS['truck']],
        gt_occlusion=[0], gt_truncation=[0],
        pred_ids=[10], pred_boxes=[box(0, 0, 50, 50)],
        pred_classes=[CAR])
    assert len(gids) == 0
    assert list(pids) == [10]


def test_class_filter_on_tracker_dets():
    # pedestrian-class preds take no part in the car evaluation
    (gids, _), (pids, _) = preprocess_frame(
        'car',
        gt_ids=[1], gt_boxes=[box(0, 0, 50, 50)], gt_classes=[CAR],
        gt_occlusion=[0], gt_truncation=[0],
        pred_ids=[10, 11],
        pred_boxes=[box(0, 0, 50, 50), box(300, 0, 30, 60)],
        pred_classes=[CAR, PED])
    assert list(pids) == [10]


def test_evaluator_hand_computed_mota():
    """3-frame single-video sequence, car class.

    Per frame: 2 clean car GT. Frame 0: both tracked. Frame 1: one missed
    (FN), one extra unmatched pred (FP). Frame 2: both tracked but one
    identity swapped to a new id (IDSW).
    numGT = 6, FN = 1, FP = 1, IDSW = 1 -> MOTA = 1 - 3/6 = 0.5.
    """
    ev = KittiEvaluator(classes=('car',))
    g1, g2 = box(0, 0, 50, 50), box(200, 0, 50, 50)
    common = dict(gt_classes=[CAR, CAR], gt_occlusion=[0, 0],
                  gt_truncation=[0, 0])
    ev.process_frame('v', 0, gt_ids=[1, 2], gt_boxes=[g1, g2],
                     pred_ids=[10, 20], pred_boxes=[g1, g2],
                     pred_classes=[CAR, CAR], **common)
    ev.process_frame('v', 1, gt_ids=[1, 2], gt_boxes=[g1, g2],
                     pred_ids=[10, 30], pred_boxes=[g1, box(500, 0, 50, 50)],
                     pred_classes=[CAR, CAR], **common)
    ev.process_frame('v', 2, gt_ids=[1, 2], gt_boxes=[g1, g2],
                     pred_ids=[10, 40], pred_boxes=[g1, g2],
                     pred_classes=[CAR, CAR], **common)
    out = ev.evaluate()
    car = out['car']
    assert car['CLR_FN'] == 1 and car['CLR_FP'] == 1 and car['IDSW'] == 1
    assert abs(car['MOTA'] - 0.5) < 1e-9
    assert 'car_MOTA' in out


def test_metrics_front_end_wiring():
    from stereotracking_tpu.evaluation.mot_metrics import MOTKittiMetrics
    m = MOTKittiMetrics()
    g = box(0, 0, 50, 50)
    m.process_frame_kitti('v', 0, gt_ids=[1], gt_boxes=[g],
                          gt_classes=[CAR], gt_occlusion=[0],
                          gt_truncation=[0], pred_ids=[7], pred_boxes=[g],
                          pred_classes=[CAR])
    out = m.evaluate_kitti()
    assert abs(out['car']['MOTA'] - 1.0) < 1e-9
    assert abs(out['car']['HOTA'] - 1.0) < 1e-9
