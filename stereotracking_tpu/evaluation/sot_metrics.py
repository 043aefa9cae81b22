"""Single-object-tracking OPE evaluation (success / precision /
norm-precision) and formatted result dumps.

Faithful numpy re-creation of
/root/reference/mmtrack/evaluation/functional/eval_sot_ope.py and the
SOTMetric accumulator/dump surface
(/root/reference/mmtrack/evaluation/metrics/sot_metrics.py): per-video
success over 21 IoU thresholds divided by the FULL video length (frames
with degenerate GT contribute -1 IoU, :26-35), center-error precision at
the 20-pixel threshold and size-normalized precision at 0.20.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def _iou_diag(g: np.ndarray, p: np.ndarray) -> np.ndarray:
    lt = np.maximum(g[:, :2], p[:, :2])
    rb = np.minimum(g[:, 2:], p[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    a1 = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    a2 = (p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])
    return inter / np.maximum(a1 + a2 - inter, 1e-10)


def success_overlap(gt_bboxes: np.ndarray, pred_bboxes: np.ndarray,
                    iou_th: np.ndarray, video_length: int) -> np.ndarray:
    success = np.zeros(len(iou_th))
    iou = np.ones(len(gt_bboxes)) * (-1)
    valid = (gt_bboxes[:, 2] > gt_bboxes[:, 0]) & \
        (gt_bboxes[:, 3] > gt_bboxes[:, 1])
    if valid.any():
        iou[valid] = _iou_diag(gt_bboxes[valid], pred_bboxes[valid])
    for i, t in enumerate(iou_th):
        success[i] = np.sum(iou > t) / float(video_length)
    return success


def success_error(gt_centers: np.ndarray, pred_centers: np.ndarray,
                  offset_th: np.ndarray, video_length: int) -> np.ndarray:
    success = np.zeros(len(offset_th))
    dist = np.ones(len(gt_centers)) * (-1)
    valid = (gt_centers[:, 0] > 0) & (gt_centers[:, 1] > 0)
    dist[valid] = np.sqrt(
        ((gt_centers[valid] - pred_centers[valid]) ** 2).sum(axis=1))
    # NOTE reference quirk kept for parity (eval_sot_ope.py:53-61):
    # frames with invalid GT centers keep dist = -1, and -1 <= t holds for
    # every threshold, so such frames count as precision successes.
    for i, t in enumerate(offset_th):
        success[i] = np.sum(dist <= t) / float(video_length)
    return success


def eval_sot_ope(results: List[List[np.ndarray]],
                 annotations: List[np.ndarray],
                 visible_infos: Optional[List[np.ndarray]] = None
                 ) -> Dict[str, float]:
    """OPE protocol over per-video prediction/GT box lists (xyxy)."""
    success_r, prec_r, nprec_r = [], [], []
    if visible_infos is None:
        visible_infos = [np.ones(len(a), bool) for a in annotations]
    for preds, gts, vis in zip(results, annotations, visible_infos):
        pred = np.stack(preds).astype(float)
        gts = np.asarray(gts, float)
        assert len(pred) == len(gts)
        video_length = len(pred)
        g = gts[vis]
        p = pred[vis]

        iou_th = np.arange(0, 1.05, 0.05)
        success_r.append(success_overlap(g, p, iou_th, video_length))

        gc = np.stack([(g[:, 0] + g[:, 2]) / 2, (g[:, 1] + g[:, 3]) / 2], 1)
        pc = np.stack([(p[:, 0] + p[:, 2]) / 2, (p[:, 1] + p[:, 3]) / 2], 1)
        offset_th = np.arange(0, 51, 1)
        prec_r.append(success_error(gc, pc, offset_th, video_length))

        wh = np.stack([g[:, 2] - g[:, 0], g[:, 3] - g[:, 1]], 1)
        nprec_r.append(success_error(gc / (wh + 1e-16), pc / (wh + 1e-16),
                                     offset_th / 100.0, video_length))

    success = np.stack(success_r) * 100
    precision = np.stack(prec_r) * 100
    nprec = np.stack(nprec_r) * 100
    return dict(success=float(np.mean(success)),
                precision=float(np.mean(precision, axis=0)[20]),
                norm_precision=float(np.mean(nprec, axis=0)[20]),
                ori_success=success, ori_precision=precision,
                ori_norm_precision=nprec)


class SOTMetric:
    """Streaming per-video accumulator + OPE compute + dump formats
    (sot_metrics.py:102-153, 277-368)."""

    def __init__(self):
        self._videos: Dict[str, dict] = {}

    def process_frame(self, video: str, pred_bbox, gt_bbox,
                      visible: bool = True):
        v = self._videos.setdefault(video,
                                    dict(pred=[], gt=[], vis=[]))
        v['pred'].append(np.asarray(pred_bbox, float))
        v['gt'].append(np.asarray(gt_bbox, float))
        v['vis'].append(bool(visible))

    def evaluate(self) -> Dict[str, float]:
        names = sorted(self._videos)
        return eval_sot_ope(
            [self._videos[n]['pred'] for n in names],
            [np.stack(self._videos[n]['gt']) for n in names],
            [np.asarray(self._videos[n]['vis']) for n in names])

    def save_formatted_results_got10k(self, out_dir: str,
                                      times: Optional[dict] = None):
        """GOT10k submission layout: <video>/<video>_001.txt with
        x,y,w,h rows + <video>_time.txt (sot_metrics.py:277-311)."""
        for name, v in self._videos.items():
            d = os.path.join(out_dir, name)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f'{name}_001.txt'), 'w') as f:
                for b in v['pred']:
                    f.write(f'{b[0]:.4f},{b[1]:.4f},'
                            f'{b[2] - b[0]:.4f},{b[3] - b[1]:.4f}\n')
            t = (times or {}).get(name, [0.0] * len(v['pred']))
            with open(os.path.join(d, f'{name}_time.txt'), 'w') as f:
                f.writelines(f'{x:.6f}\n' for x in t)

    def save_formatted_results_trackingnet(self, out_dir: str):
        """TrackingNet submission layout: <video>.txt with x,y,w,h rows
        (sot_metrics.py:312-336)."""
        os.makedirs(out_dir, exist_ok=True)
        for name, v in self._videos.items():
            with open(os.path.join(out_dir, f'{name}.txt'), 'w') as f:
                for b in v['pred']:
                    f.write(f'{b[0]:.4f},{b[1]:.4f},'
                            f'{b[2] - b[0]:.4f},{b[3] - b[1]:.4f}\n')
