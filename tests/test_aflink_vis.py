"""AFLink + visualization smoke/behavior tests."""
import numpy as np

from stereotracking_tpu.evaluation.aflink import AppearanceFreeLink
from stereotracking_tpu.visualization import TrackVisualizer, draw_mot_errors


def _box(x, y, w=12, h=10):
    return [x, y, x + w, y + h]


def test_aflink_candidate_gating_and_merge_machinery():
    """Two tracklets of the same object split by a gap: they are candidate
    pairs; with a permissive threshold the ids merge consistently."""
    frames = {}
    for f in range(10):
        frames[f] = (np.array([1]), np.array([_box(10 + 4 * f, 50)], float))
    for f in range(14, 24):
        frames[f] = (np.array([2]),
                     np.array([_box(10 + 4 * f, 50)], float))
    linker = AppearanceFreeLink(confidence_threshold=0.0)  # accept all pairs
    out = linker.link(frames)
    ids = {int(i) for f in out for i in out[f][0]}
    assert ids == {1}  # tracklet 2 merged into 1

    # far-away tracklet must NOT be a candidate even at threshold 0
    frames[30] = (np.array([3]), np.array([_box(900, 700)], float))
    for f in range(31, 40):
        frames[f] = (np.array([3]), np.array([_box(900, 700)], float))
    out = linker.link(frames)
    ids = {int(i) for f in out for i in out[f][0]}
    assert 3 in ids  # spatial gate kept it separate from 1


def test_visualizer_draws_boxes():
    img = np.zeros((64, 96, 3), np.uint8)
    vis = TrackVisualizer()
    out = vis.draw(img, np.array([_box(10, 10)]), np.array([7]),
                   np.array([0.9]))
    assert out.shape == (64, 96, 3)
    assert out.sum() > 0  # something drawn

    panel = vis.draw_gt_pred(img, np.array([_box(10, 10)]), np.array([1]),
                             np.array([_box(12, 10)]), np.array([2]))
    assert panel.shape == (128, 96, 3)


def test_error_visualization_classifies():
    img = np.zeros((64, 96, 3), np.uint8)
    gt = np.array([_box(10, 10)], float)
    pred = np.array([_box(11, 10), _box(70, 40)], float)
    out, match = draw_mot_errors(img, gt, np.array([1]), pred,
                                 np.array([5, 6]), prev_match={})
    assert match == {1: 5}
    out2, match2 = draw_mot_errors(img, gt, np.array([1]),
                                   np.array([_box(11, 10)], float),
                                   np.array([9]), prev_match=match)
    assert match2 == {1: 9}  # id switch recorded in the running match
