"""Detector stack tests: shapes, decode goldens, NMS oracle parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.detector import (DetectorConfig, YOLOXDetector,
                                                detector_predict)
from stereotracking_tpu.models.yolox_head import (decode_predictions,
                                                  level_priors)
from stereotracking_tpu.ops.nms import batched_nms


def test_backbone_neck_head_shapes():
    cfg = DetectorConfig()
    module = YOLOXDetector(cfg)
    h, w = 256, 320
    inputs = {
        'img': jnp.zeros((1, h, w, 3)),
        'disp_postp': jnp.zeros((1, h, w, 3)),
        'disp_mask': jnp.zeros((1, h, w, 1)),
    }
    variables = module.init(jax.random.PRNGKey(0), inputs, train=False)
    cls, reg, obj = module.apply(variables, inputs, train=False)
    assert len(cls) == 3
    for lvl, stride in enumerate((8, 16, 32)):
        assert cls[lvl].shape == (1, h // stride, w // stride, 1)
        assert reg[lvl].shape == (1, h // stride, w // stride, 4)
        assert obj[lvl].shape == (1, h // stride, w // stride, 1)
    # dual branch: disparity stem params exist and match the rgb stem shapes
    bb = variables['params']['backbone']
    assert 'disp_stem' in bb and 'disp_stage1' in bb
    chex_tree = jax.tree.map(lambda a: a.shape, bb['stem'])
    assert chex_tree == jax.tree.map(lambda a: a.shape, bb['disp_stem'])


def test_param_count_plausible():
    module = YOLOXDetector(DetectorConfig())
    inputs = {
        'img': jnp.zeros((1, 64, 64, 3)),
        'disp_postp': jnp.zeros((1, 64, 64, 3)),
        'disp_mask': jnp.zeros((1, 64, 64, 1)),
    }
    variables = module.init(jax.random.PRNGKey(0), inputs, train=False)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree.leaves(variables['params']))
    # YOLOX-S ~8.9M (80 cls); 1 class + extra disparity stem/stage1 ~ 9.0M
    assert 8.0e6 < n < 10.5e6, n


def test_decode_golden():
    # one level, 2x2 grid, stride 8
    reg = jnp.array([[[[0.0, 0.0, 0.0, 0.0],
                       [1.0, 0.5, jnp.log(2.0), jnp.log(3.0)]],
                      [[0.0, 0.0, 0.0, 0.0],
                       [0.0, 0.0, 0.0, 0.0]]]])  # (1, 2, 2, 4)
    cls = jnp.zeros((1, 2, 2, 1))
    obj = jnp.zeros((1, 2, 2, 1))
    boxes, scores = decode_predictions([cls], [reg], [obj], strides=(8,))
    b = np.asarray(boxes[0])
    # anchor (0, 1): cx = 1*8 + 8 = 16, cy = 0.5*8 + 0 = 4, w = 16, h = 24
    np.testing.assert_allclose(b[1], [16 - 8, 4 - 12, 16 + 8, 4 + 12],
                               atol=1e-4)
    # sigmoid(0) * sigmoid(0) = 0.25
    np.testing.assert_allclose(np.asarray(scores[0])[:, 0], 0.25, atol=1e-6)


def test_priors_layout_matches_row_major():
    p = np.asarray(level_priors(2, 3, 16))
    assert p.shape == (6, 4)
    np.testing.assert_allclose(p[0], [0, 0, 16, 16])
    np.testing.assert_allclose(p[1], [16, 0, 16, 16])   # x fastest
    np.testing.assert_allclose(p[3], [0, 16, 16, 16])


def nms_oracle(boxes, scores, iou_thr):
    """Greedy NMS reference (torchvision semantics)."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a1 + a2 - inter, 1e-6) > iou_thr:
                suppressed[j] = True
    return keep


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_nms_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    n = 60
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    res = batched_nms(boxes, scores, np.zeros(n, np.int32), 0.5,
                      score_threshold=0.1, pre_nms_top_k=64, max_out=32)
    exp_keep = [i for i in nms_oracle(boxes, scores, 0.5) if scores[i] > 0.1]
    got_scores = np.asarray(res.scores)[np.asarray(res.valid)]
    exp_scores = np.sort(scores[exp_keep])[::-1][:32]
    np.testing.assert_allclose(got_scores, exp_scores, atol=1e-6)
    got_boxes = np.asarray(res.boxes)[np.asarray(res.valid)]
    np.testing.assert_allclose(
        got_boxes, boxes[sorted(exp_keep, key=lambda i: -scores[i])][:32],
        atol=1e-5)


def test_nms_class_aware():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    # same class: second suppressed
    r = batched_nms(boxes, scores, np.array([0, 0], np.int32), 0.5,
                    pre_nms_top_k=2, max_out=4)
    assert int(np.asarray(r.valid).sum()) == 1
    # different classes: both kept
    r = batched_nms(boxes, scores, np.array([0, 1], np.int32), 0.5,
                    pre_nms_top_k=2, max_out=4)
    assert int(np.asarray(r.valid).sum()) == 2
