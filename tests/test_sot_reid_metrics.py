"""SOT OPE + ReID metrics, hand-computed fixtures (reference:
mmtrack/evaluation/functional/eval_sot_ope.py,
mmtrack/evaluation/metrics/reid_metrics.py)."""
import numpy as np

from stereotracking_tpu.evaluation.reid_metrics import evaluate_reid
from stereotracking_tpu.evaluation.sot_metrics import (SOTMetric,
                                                       eval_sot_ope)


def test_perfect_tracking_scores():
    gts = [np.array([[0, 0, 10, 10], [5, 5, 15, 15]], float)]
    preds = [[g for g in gts[0]]]
    out = eval_sot_ope(preds, gts)
    # IoU == 1 > all thresholds except 1.0 -> success = 20/21 * 100
    assert abs(out['success'] - 100 * 20 / 21) < 1e-6
    assert out['precision'] == 100.0
    assert out['norm_precision'] == 100.0


def test_half_tracked_video():
    gts = [np.array([[0, 0, 10, 10]] * 4, float)]
    preds = [[np.array([0, 0, 10, 10], float)] * 2
             + [np.array([100, 100, 110, 110], float)] * 2]
    out = eval_sot_ope(preds, gts)
    # half the frames at IoU 1, half at 0 -> mean over thresholds:
    # 0.5*(20/21) + ... -> just check the binary structure
    s = out['ori_success'][0] / 100
    assert abs(s[0] - 0.5) < 1e-9          # IoU > 0 on half
    assert abs(s[10] - 0.5) < 1e-9
    # precision at 20px: centers off by ~141px for half the frames
    assert abs(out['precision'] - 50.0) < 1e-9


def test_degenerate_gt_counts_against_success():
    """Zero-size GT frames keep IoU=-1 but stay in the denominator
    (eval_sot_ope.py:26-35)."""
    gts = [np.array([[0, 0, 10, 10], [5, 5, 5, 5]], float)]
    preds = [[np.array([0, 0, 10, 10], float)] * 2]
    out = eval_sot_ope(preds, gts)
    assert abs(out['ori_success'][0][0] / 100 - 0.5) < 1e-9


def test_sot_metric_accumulator_and_dumps(tmp_path):
    m = SOTMetric()
    for f in range(3):
        m.process_frame('video_a', [0, 0, 10, 10], [0, 0, 10, 10])
    out = m.evaluate()
    assert out['precision'] == 100.0
    m.save_formatted_results_got10k(str(tmp_path / 'got'))
    assert (tmp_path / 'got' / 'video_a' / 'video_a_001.txt').exists()
    assert (tmp_path / 'got' / 'video_a' / 'video_a_time.txt').exists()
    m.save_formatted_results_trackingnet(str(tmp_path / 'tn'))
    line = (tmp_path / 'tn' / 'video_a.txt').read_text().splitlines()[0]
    assert line == '0.0000,0.0000,10.0000,10.0000'


def test_reid_perfect_separation():
    feats = np.array([[1, 0], [1, 0.01], [0, 1], [0, 0.99]], float)
    pids = np.array([0, 0, 1, 1])
    out = evaluate_reid(feats, pids, max_rank=3, rank_list=(1, 3))
    assert out['mAP'] == 1.0 and out['R1'] == 1.0


def test_reid_query_without_gallery_match_skipped():
    feats = np.array([[1, 0], [1, 0.01], [0, 1]], float)
    pids = np.array([0, 0, 7])       # id 7 appears once -> skipped
    out = evaluate_reid(feats, pids, max_rank=2, rank_list=(1,))
    assert out['mAP'] == 1.0


def test_reid_imperfect_ranking():
    # query 0's true match ranks second -> AP = 0.5, R1 = 0
    feats = np.array([[1.0, 0.0], [0.0, 1.0], [0.9, 0.1]], float)
    pids = np.array([0, 0, 1])
    out = evaluate_reid(feats, pids, max_rank=2, rank_list=(1, 2))
    # query0: gallery order [2 (wrong), 1 (right)] -> AP 0.5, cmc [0, 1]
    # query1: order [2, 0]? dist(1,0)=2, dist(1,2)~ (0.9^2+0.81)... both
    # queries validate the machinery; just check bounds
    assert 0 < out['mAP'] < 1
    assert out['R2'] == 1.0
