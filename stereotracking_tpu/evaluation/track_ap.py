"""Track-level average precision: YouTube-VIS mask-track AP and
TAO-style box-track AP.

Re-creates the evaluation semantics of
/root/reference/mmtrack/evaluation/metrics/youtube_vis_metrics.py (+ the
vendored ytviseval.py COCO-style machinery) and the track-AP core of
tao_metrics.py:

* track IoU = sum of per-frame intersections / sum of per-frame unions
  over the video (frames where either side is absent contribute that
  side's area to the union only) — ytviseval's spatio-temporal IoU;
* COCO AP protocol per category: predictions ranked by score, greedy
  matching at each IoU threshold (0.50:0.95:0.05), 101-point
  interpolated precision, averaged over thresholds and categories;
* TAO federated category handling (tao_metrics.py:380-392 passes each
  video's ``neg_category_ids`` / ``not_exhaustive_category_ids`` into the
  TAO toolkit, whose LVIS-style rules are): for category c, predictions
  are scored only on videos where c is *verified* — positive (has a gt
  track of c) or explicitly negative (c in ``neg_category_ids``);
  predictions on unverified videos are dropped, and unmatched predictions
  on videos where c is in ``not_exhaustive_category_ids`` are ignored
  rather than counted as false positives. Videos with no registered meta
  are treated as exhaustively annotated (the YTVIS / non-federated case).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.arange(0.5, 1.0, 0.05)


def mask_track_iou(pred: Dict[int, np.ndarray],
                   gt: Dict[int, np.ndarray]) -> float:
    """Spatio-temporal mask IoU between two tracks (frame -> bool mask)."""
    inter = 0.0
    union = 0.0
    for f in set(pred) | set(gt):
        p = pred.get(f)
        g = gt.get(f)
        if p is not None and g is not None:
            inter += float(np.logical_and(p, g).sum())
            union += float(np.logical_or(p, g).sum())
        elif p is not None:
            union += float(p.sum())
        elif g is not None:
            union += float(g.sum())
    return inter / union if union > 0 else 0.0


def bbox_track_iou(pred: Dict[int, np.ndarray],
                   gt: Dict[int, np.ndarray]) -> float:
    """Spatio-temporal box IoU (TAO 3D IoU): summed per-frame
    intersections / unions of xyxy boxes."""
    inter = 0.0
    union = 0.0
    for f in set(pred) | set(gt):
        p = pred.get(f)
        g = gt.get(f)
        ap = 0.0 if p is None else max(0., p[2] - p[0]) * max(0., p[3] - p[1])
        ag = 0.0 if g is None else max(0., g[2] - g[0]) * max(0., g[3] - g[1])
        if p is not None and g is not None:
            lt = np.maximum(p[:2], g[:2])
            rb = np.minimum(p[2:], g[2:])
            wh = np.clip(rb - lt, 0, None)
            i = float(wh[0] * wh[1])
        else:
            i = 0.0
        inter += i
        union += ap + ag - i
    return inter / union if union > 0 else 0.0


class TrackAPEvaluator:
    """COCO-protocol AP over video tracks.

    ``mode``: 'mask' (YouTube-VIS) or 'bbox' (TAO)."""

    def __init__(self, mode: str = 'mask', federated: bool = False):
        assert mode in ('mask', 'bbox')
        self._iou = mask_track_iou if mode == 'mask' else bbox_track_iou
        self._gt = []     # (video, label, track)
        self._pred = []   # (video, label, score, track)
        self.federated = federated
        self._neg_cats: Dict[str, set] = {}
        self._not_exhaustive_cats: Dict[str, set] = {}

    def add_gt_track(self, video: str, label: int,
                     track: Dict[int, np.ndarray]):
        self._gt.append((video, int(label), track))

    def add_pred_track(self, video: str, label: int, score: float,
                       track: Dict[int, np.ndarray]):
        self._pred.append((video, int(label), float(score), track))

    def add_video_meta(self, video: str,
                       neg_category_ids: Sequence[int] = (),
                       not_exhaustive_category_ids: Sequence[int] = ()):
        """Register a video's federated annotation meta (the per-video
        ``neg_category_ids`` / ``not_exhaustive_category_ids`` of TAO)."""
        self._neg_cats[video] = set(int(c) for c in neg_category_ids)
        self._not_exhaustive_cats[video] = set(
            int(c) for c in not_exhaustive_category_ids)

    def evaluate(self) -> Dict[str, float]:
        cats = sorted({g[1] for g in self._gt})
        ap_per_thr_cat = np.full((len(IOU_THRS), len(cats)), np.nan)
        for ci, cat in enumerate(cats):
            gts = [(v, t) for v, l, t in self._gt if l == cat]
            preds = sorted(((v, s, t) for v, l, s, t in self._pred
                            if l == cat), key=lambda x: -x[1])
            n_gt = len(gts)
            if n_gt == 0:
                continue
            if self.federated:
                # keep predictions only on videos where ``cat`` is
                # verified: positive (has gt) or explicitly negative;
                # videos with no registered meta stay verified
                pos_videos = {v for v, _ in gts}
                preds = [
                    (v, s, t) for v, s, t in preds
                    if v in pos_videos or v not in self._neg_cats
                    or cat in self._neg_cats[v]]
            ious = np.zeros((len(preds), n_gt))
            for pi, (pv, _, pt) in enumerate(preds):
                for gi, (gv, gt) in enumerate(gts):
                    if pv == gv:
                        ious[pi, gi] = self._iou(pt, gt)
            for ti, thr in enumerate(IOU_THRS):
                taken = np.zeros(n_gt, bool)
                tp = np.zeros(len(preds))
                keep = np.ones(len(preds), bool)
                for pi in range(len(preds)):
                    cand = np.where(~taken & (ious[pi] >= thr))[0]
                    if len(cand):
                        best = cand[np.argmax(ious[pi][cand])]
                        taken[best] = True
                        tp[pi] = 1
                    elif self.federated and cat in \
                            self._not_exhaustive_cats.get(preds[pi][0], ()):
                        # unmatched prediction on a not-exhaustively
                        # annotated video: ignored, not a false positive
                        keep[pi] = False
                tp = tp[keep]
                fp = 1 - tp
                ctp = np.cumsum(tp)
                cfp = np.cumsum(fp)
                recall = ctp / n_gt
                precision = ctp / np.maximum(ctp + cfp, 1e-9)
                # 101-point interpolation (COCO)
                prec_interp = np.zeros(101)
                for ri, r in enumerate(np.linspace(0, 1, 101)):
                    mask = recall >= r
                    prec_interp[ri] = precision[mask].max() if mask.any() \
                        else 0.0
                ap_per_thr_cat[ti, ci] = prec_interp.mean()
        valid = ~np.isnan(ap_per_thr_cat)
        mean_ap = float(ap_per_thr_cat[valid].mean()) if valid.any() else 0.0
        ap50 = float(np.nanmean(ap_per_thr_cat[0])) if valid.any() else 0.0
        ap75 = float(np.nanmean(ap_per_thr_cat[5])) if valid.any() else 0.0
        return {'track_mAP': mean_ap, 'track_AP50': ap50,
                'track_AP75': ap75}


class YTVISMetric(TrackAPEvaluator):
    """YouTube-VIS mask-track AP (youtube_vis_metrics.py surface)."""

    def __init__(self):
        super().__init__('mask')


class TAOMetric(TrackAPEvaluator):
    """TAO box-track AP with federated category handling
    (tao_metrics.py surface; register per-video ``neg_category_ids`` /
    ``not_exhaustive_category_ids`` via :meth:`add_video_meta`)."""

    def __init__(self, federated: bool = True):
        super().__init__('bbox', federated=federated)
