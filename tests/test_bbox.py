import numpy as np
import pytest

from stereotracking_tpu.structures import bbox as B


def np_xyxy_to_cxcyah(b):
    cx = (b[:, 2] + b[:, 0]) / 2
    cy = (b[:, 3] + b[:, 1]) / 2
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    return np.stack([cx, cy, w / h, h], -1)


def random_boxes(n, seed=0, lo=0, hi=500):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(lo, hi, size=(n, 2))
    wh = rng.uniform(1, 100, size=(n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_cxcyah_roundtrip():
    b = random_boxes(32)
    ah = np.asarray(B.bbox_xyxy_to_cxcyah(b))
    np.testing.assert_allclose(ah, np_xyxy_to_cxcyah(b), rtol=1e-5)
    back = np.asarray(B.bbox_cxcyah_to_xyxy(ah))
    np.testing.assert_allclose(back, b, rtol=1e-4, atol=1e-3)


def test_cxcywh_roundtrip():
    b = random_boxes(16, seed=1)
    cw = np.asarray(B.bbox_xyxy_to_cxcywh(b))
    back = np.asarray(B.bbox_cxcywh_to_xyxy(cw))
    np.testing.assert_allclose(back, b, rtol=1e-5, atol=1e-3)


def test_scale_bbox_matches_reference_semantics():
    b = random_boxes(8, seed=2)
    s = np.linspace(1.0, 3.0, 8).astype(np.float32)
    out = np.asarray(B.scale_bbox(b, s))
    # reference formula (trackers/utils.py:58-73)
    cx = (b[:, 0] + b[:, 2]) / 2
    cy = (b[:, 1] + b[:, 3]) / 2
    w = (b[:, 2] - b[:, 0]) * s
    h = (b[:, 3] - b[:, 1]) * s
    exp = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-3)
    # scale then unscale is identity
    back = np.asarray(B.scale_bbox(out, 1.0 / s))
    np.testing.assert_allclose(back, b, rtol=1e-4, atol=1e-2)


def test_iou_matrix_golden():
    b1 = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    b2 = np.array([[0, 0, 10, 10], [10, 10, 20, 20], [100, 100, 110, 110]],
                  np.float32)
    iou = np.asarray(B.bbox_iou_matrix(b1, b2))
    exp = np.array([
        [1.0, 0.0, 0.0],
        [25. / 175., 25. / 175., 0.0],
    ])
    np.testing.assert_allclose(iou, exp, rtol=1e-5, atol=1e-6)


def test_iou_matrix_vs_bruteforce():
    b1 = random_boxes(20, seed=3)
    b2 = random_boxes(30, seed=4)
    got = np.asarray(B.bbox_iou_matrix(b1, b2))
    for i in range(20):
        for j in range(30):
            xx1 = max(b1[i, 0], b2[j, 0])
            yy1 = max(b1[i, 1], b2[j, 1])
            xx2 = min(b1[i, 2], b2[j, 2])
            yy2 = min(b1[i, 3], b2[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            exp = inter / max(a1 + a2 - inter, 1e-6)
            assert got[i, j] == pytest.approx(exp, rel=1e-4, abs=1e-5)
