"""VOT supervised-experiment evaluation: accuracy / robustness / EAO.

Faithful numpy transcription of
/root/reference/mmtrack/evaluation/functional/eval_sot_vot.py (itself
modified from the official VOT toolkit): trajectories mix normal xyxy
boxes with 1-element special states ([1] initialization, [2] failure,
[0] unknown/skipped); accuracy masks burn-in frames after each
re-initialization, robustness counts failures per frame, EAO averages
the expected-overlap curve over fragments between initializations.

Deviation (cited): region overlap supports rectangles (all our trackers
emit boxes); the toolkit's rotated-polygon overlap is out of scope.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

UNKNOWN, INIT, FAILURE = 0.0, 1.0, 2.0


def _is_special(bbox) -> bool:
    return len(bbox) == 1


def _rect_iou(a: np.ndarray, b: np.ndarray,
              bound_wh: Optional[Tuple[int, int]] = None) -> float:
    """Rectangle IoU, optionally clipped to the video bounding region
    (the toolkit's ``calculate_region_overlaps(..., bounds)``)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    if bound_wh is not None:
        w, h = bound_wh
        a = np.array([max(a[0], 0), max(a[1], 0), min(a[2], w),
                      min(a[3], h)])
        b = np.array([max(b[0], 0), max(b[1], 0), min(b[2], w),
                      min(b[3], h)])
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    aa = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
    ab = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
    union = aa + ab - inter
    return float(inter / union) if union > 0 else 0.0


def _overlaps(pred_traj: Sequence[np.ndarray], gt_traj: Sequence,
              video_wh: Optional[Tuple[int, int]]) -> np.ndarray:
    out = np.zeros(len(pred_traj))
    for i, (p, g) in enumerate(zip(pred_traj, gt_traj)):
        p = np.asarray(p, float)
        g = np.asarray(g, float)
        if _is_special(p) or len(g) < 4:
            out[i] = 0.0
        else:
            gx = g if len(g) == 4 else np.array(
                [g[0::2].min(), g[1::2].min(), g[0::2].max(), g[1::2].max()])
            out[i] = _rect_iou(p, gx, video_wh)
    return out


def locate_failures_inits(traj: Sequence[np.ndarray]
                          ) -> Tuple[List[int], List[int]]:
    fails, inits = [], []
    for i, b in enumerate(traj):
        if _is_special(b):
            if b[0] == INIT:
                inits.append(i)
            elif b[0] == FAILURE:
                fails.append(i)
    return fails, inits


def count_failures(traj: Sequence[np.ndarray]) -> int:
    return sum(1 for b in traj if _is_special(b) and b[0] == FAILURE)


def calc_accuracy(gt_traj, pred_traj, burnin: int = 10,
                  ignore_unknown: bool = True,
                  video_wh: Optional[Tuple[int, int]] = None) -> float:
    """eval_sot_vot.py:100-143."""
    overlaps = _overlaps(pred_traj, gt_traj, video_wh)
    mask = np.ones(len(overlaps), bool)
    for i, b in enumerate(pred_traj):
        b = np.asarray(b, float)
        if not _is_special(b):
            continue
        if b[0] == UNKNOWN and ignore_unknown:
            mask[i] = False
        elif b[0] == INIT:
            mask[i:min(len(pred_traj), i + burnin)] = False
        elif b[0] == FAILURE:
            mask[i] = False
    return float(np.mean(overlaps[mask])) if mask.any() else 0.0


def eval_sot_accuracy_robustness(
        results: List[List[np.ndarray]], annotations: List[np.ndarray],
        burnin: int = 10, ignore_unknown: bool = True,
        videos_wh: Optional[List[Tuple[int, int]]] = None
        ) -> Dict[str, float]:
    """eval_sot_vot.py:144-199 (annotations per video: (N, 4) xyxy)."""
    videos_wh = videos_wh or [None] * len(annotations)
    accuracy = 0.0
    num_fails = 0
    weight = 0
    for gt_traj, pred_traj, wh in zip(annotations, results, videos_wh):
        assert len(gt_traj) == len(pred_traj)
        assert _is_special(pred_traj[0]) and pred_traj[0][0] == INIT
        num_fails += count_failures(pred_traj)
        accuracy += calc_accuracy(gt_traj, pred_traj, burnin,
                                  ignore_unknown, wh) * len(pred_traj)
        weight += len(pred_traj)
    return dict(accuracy=accuracy / weight,
                robustness=num_fails / weight * 100,
                num_fails=num_fails)


def calc_eao_curve(overlaps: List[List[float]],
                   successes: List[bool]) -> np.ndarray:
    """eval_sot_vot.py:201-243, exact (including the 1-based running
    mean)."""
    max_len = max(len(o) for o in overlaps)
    n = len(overlaps)
    arr = np.zeros((n, max_len), np.float32)
    mask = np.zeros((n, max_len), np.float32)
    for i, (o, s) in enumerate(zip(overlaps, successes)):
        arr[i, :len(o)] = np.asarray(o)
        mask[i, : (max_len if not s else len(o))] = 1.0
    cum = arr.copy()
    for j in range(1, max_len):
        cum[:, j] = np.mean(arr[:, 1:j + 1], axis=1)
    return np.sum(cum * mask, axis=0) / np.sum(mask, axis=0)


def eval_sot_eao(results: List[List[np.ndarray]],
                 annotations: List[np.ndarray],
                 interval: Sequence[int] = (100, 356),
                 videos_wh: Optional[List[Tuple[int, int]]] = None
                 ) -> Dict[str, float]:
    """eval_sot_vot.py:244-314."""
    videos_wh = videos_wh or [None] * len(annotations)
    all_overlaps: List[List[float]] = []
    all_successes: List[bool] = []
    for gt_traj, pred_traj, wh in zip(annotations, results, videos_wh):
        assert len(gt_traj) == len(pred_traj)
        assert _is_special(pred_traj[0]) and pred_traj[0][0] == INIT
        fails, inits = locate_failures_inits(pred_traj)
        overlaps = list(_overlaps(pred_traj, gt_traj, wh))
        if fails:
            for k in range(len(fails)):
                all_overlaps.append(overlaps[inits[k]:fails[k]])
                all_successes.append(False)
            if len(inits) > len(fails):
                all_overlaps.append(overlaps[inits[-1]:])
                all_successes.append(True)
        else:
            all_overlaps.append(overlaps)
            all_successes.append(True)
    curve = calc_eao_curve(all_overlaps, all_successes)
    lo, hi = interval
    return dict(eao=float(np.mean(curve[lo:hi + 1])))
