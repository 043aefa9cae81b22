"""A/B the SOT OPE evaluation against the REFERENCE's own code.

Imports the actual reference ``eval_sot_ope``
(/root/reference/mmtrack/evaluation/functional/eval_sot_ope.py, never
copied into the repo) with the absent ``mmdet`` stubbed at the import
boundary (only ``bbox_overlaps`` — the standard IoU matrix with mmdet's
eps=1e-6 union clamp), and asserts the repo's
``stereotracking_tpu.evaluation.sot_metrics.eval_sot_ope`` produces
identical success / precision / norm-precision on randomized worlds that
include degenerate GT boxes, invalid (non-positive) GT centers, and
per-frame visibility masks.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from stereotracking_tpu.evaluation.sot_metrics import eval_sot_ope

REF_FILE = ('/root/reference/mmtrack/evaluation/functional/'
            'eval_sot_ope.py')

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_FILE), reason='reference checkout not available')


def _bbox_overlaps(bboxes1, bboxes2, mode='iou', eps=1e-6):
    """mmdet.evaluation.functional.bbox_overlaps (numpy) contract."""
    bboxes1 = np.asarray(bboxes1, float)
    bboxes2 = np.asarray(bboxes2, float)
    rows, cols = len(bboxes1), len(bboxes2)
    ious = np.zeros((rows, cols))
    if rows * cols == 0:
        return ious
    area1 = (bboxes1[:, 2] - bboxes1[:, 0]) * (bboxes1[:, 3] - bboxes1[:, 1])
    area2 = (bboxes2[:, 2] - bboxes2[:, 0]) * (bboxes2[:, 3] - bboxes2[:, 1])
    for i in range(rows):
        x_start = np.maximum(bboxes1[i, 0], bboxes2[:, 0])
        y_start = np.maximum(bboxes1[i, 1], bboxes2[:, 1])
        x_end = np.minimum(bboxes1[i, 2], bboxes2[:, 2])
        y_end = np.minimum(bboxes1[i, 3], bboxes2[:, 3])
        overlap = (np.maximum(x_end - x_start, 0)
                   * np.maximum(y_end - y_start, 0))
        union = area1[i] + area2 - overlap
        union = np.maximum(union, eps)
        ious[i] = overlap / union
    return ious


def _load_reference_module():
    mmdet = types.ModuleType('mmdet')
    evaluation = types.ModuleType('mmdet.evaluation')
    functional = types.ModuleType('mmdet.evaluation.functional')
    functional.bbox_overlaps = _bbox_overlaps
    evaluation.functional = functional
    mmdet.evaluation = evaluation
    saved = {k: sys.modules.get(k)
             for k in ('mmdet', 'mmdet.evaluation',
                       'mmdet.evaluation.functional')}
    sys.modules['mmdet'] = mmdet
    sys.modules['mmdet.evaluation'] = evaluation
    sys.modules['mmdet.evaluation.functional'] = functional
    try:
        spec = importlib.util.spec_from_file_location('ref_eval_sot_ope',
                                                      REF_FILE)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


@pytest.fixture(scope='module')
def ref():
    return _load_reference_module()


def _make_world(rng, n_videos=4):
    results, annotations, visibles = [], [], []
    for _ in range(n_videos):
        n = int(rng.randint(20, 120))
        gts = []
        preds = []
        cx, cy = rng.uniform(30, 200), rng.uniform(30, 200)
        for t in range(n):
            cx += rng.normal(0, 5)
            cy += rng.normal(0, 5)
            r = rng.rand()
            if r < 0.06:
                # degenerate zero-size GT box
                gts.append([cx, cy, cx, cy])
            elif r < 0.12:
                # GT center at/below zero: hits the invalid-center branch
                gts.append([-40., -30., 10., 14.])
            else:
                bw, bh = rng.uniform(10, 40), rng.uniform(10, 40)
                gts.append([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                            cy + bh / 2])
            g = np.asarray(gts[-1])
            noise = rng.normal(0, rng.choice([1.0, 8.0, 30.0]), 4)
            preds.append(g + noise)
        results.append(preds)
        annotations.append(np.asarray(gts, float))
        visibles.append(rng.rand(n) < 0.9)
    return results, annotations, visibles


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('use_visible', [False, True])
def test_ope_matches_reference(ref, seed, use_visible):
    rng = np.random.RandomState(seed)
    results, annotations, visibles = _make_world(rng)
    vis = visibles if use_visible else None
    ours = eval_sot_ope(results, annotations, visible_infos=vis)
    theirs = ref.eval_sot_ope(results, annotations, visible_infos=vis)
    for key in ('success', 'precision', 'norm_precision'):
        assert ours[key] == pytest.approx(float(theirs[key]), abs=1e-9), key
    np.testing.assert_allclose(ours['ori_success'],
                               theirs['ori_success'], atol=1e-9)
    np.testing.assert_allclose(ours['ori_precision'],
                               theirs['ori_precision'], atol=1e-9)
    np.testing.assert_allclose(ours['ori_norm_precision'],
                               theirs['ori_norm_precision'], atol=1e-9)
