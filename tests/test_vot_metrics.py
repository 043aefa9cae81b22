"""VOT accuracy/robustness/EAO transcription tests (reference:
mmtrack/evaluation/functional/eval_sot_vot.py)."""
import numpy as np

from stereotracking_tpu.evaluation.vot_metrics import (
    calc_accuracy, calc_eao_curve, count_failures,
    eval_sot_accuracy_robustness, eval_sot_eao, locate_failures_inits)


def _box(x=0, y=0, s=10):
    return np.array([x, y, x + s, y + s], float)


def test_locate_and_count():
    traj = [np.array([1.]), _box(), np.array([2.]), np.array([0.]),
            np.array([1.]), _box()]
    fails, inits = locate_failures_inits(traj)
    assert fails == [2] and inits == [0, 4]
    assert count_failures(traj) == 1


def test_accuracy_burnin_masks_after_init():
    gt = [_box()] * 5
    pred = [np.array([1.]), _box(), _box(5, 0), _box(), _box()]
    # burnin 2 masks frames 0-1; rest average of IoU(0,5-shift,1,1)
    acc = calc_accuracy(gt, pred, burnin=2)
    iou_shift = 50 / 150
    want = (iou_shift + 1.0 + 1.0) / 3
    assert abs(acc - want) < 1e-9


def test_accuracy_robustness_aggregate():
    gt = [[_box()] * 4, [_box()] * 4]
    pred1 = [np.array([1.]), _box(), _box(), _box()]
    pred2 = [np.array([1.]), _box(), np.array([2.]), np.array([0.])]
    out = eval_sot_accuracy_robustness([pred1, pred2], gt, burnin=1)
    assert out['num_fails'] == 1
    assert abs(out['robustness'] - 1 / 8 * 100) < 1e-9


def test_eao_perfect_tracking():
    gt = [[_box()] * 6]
    pred = [[np.array([1.])] + [_box()] * 5]
    out = eval_sot_eao(pred, gt, interval=(1, 4))
    # overlaps after init are all 1; running means from index 1 are 1
    assert abs(out['eao'] - 1.0) < 1e-9


def test_eao_failed_fragment_penalizes():
    """A failed fragment shorter than the interval is zero-padded to the
    longest fragment (eval_sot_vot.py:221-229), dragging EAO down."""
    gt = [[_box()] * 8]
    pred = [[np.array([1.]), _box(), np.array([2.]), np.array([0.]),
             np.array([1.]), _box(), _box(), _box()]]
    out = eval_sot_eao(pred, gt, interval=(1, 3))
    # fragments: failed len 2 (padded with zeros to len 4), success len 4
    # curve[j] averages both -> strictly below 1 past the pad boundary
    assert 0.0 < out['eao'] < 1.0


def test_eao_curve_padding_semantics():
    # failed fragment: mask extends to max length with zero padding
    curve = calc_eao_curve([[1.0, 1.0], [1.0, 1.0, 1.0, 1.0]],
                           [False, True])
    # j=3: failed run contributes mean([1,0,0])=1/3... padded zeros
    assert curve.shape == (4,)
    assert curve[1] == 1.0
    assert curve[3] < 1.0
