"""Independent numpy oracle for the Tracktor association step (reference
mmtrack/models/trackers/tracktor_tracker.py:49-272): regression
propagation with class-agnostic NMS, overlap suppression of new
detections, ReID re-activation of lost tracks, ring-buffer embedding
memory."""
import numpy as np
from scipy.optimize import linear_sum_assignment

from oracle_tracker import iou_matrix

BIG = 1e6


class _T:
    pass


class OracleTracktor:
    def __init__(self, obj_score_thr=0.5, regression_score_thr=0.5,
                 regression_nms_iou=0.6, regression_match_iou=0.3,
                 reid_match_score_thr=2.0, reid_match_iou_thr=0.2,
                 num_samples=10, num_frames_retain=10):
        self.obj_score_thr = obj_score_thr
        self.reg_score_thr = regression_score_thr
        self.reg_nms_iou = regression_nms_iou
        self.reg_match_iou = regression_match_iou
        self.reid_score_thr = reid_match_score_thr
        self.reid_iou_thr = reid_match_iou_thr
        self.num_samples = num_samples
        self.retain = num_frames_retain
        self.tracks = {}
        self.num_tracks = 0

    def step(self, reg_of, emb_of, det_boxes, det_scores, det_labels,
             det_embeds, frame):
        """``reg_of(bbox) -> (reg_box, reg_score)`` and
        ``emb_of(bbox) -> embed`` are deterministic closures shared with
        the system under test."""
        n = len(det_boxes)
        live = sorted(self.tracks)
        active = [t for t in live
                  if self.tracks[t].last_frame == frame - 1]
        regs = {t: reg_of(self.tracks[t].bbox) for t in active}

        # propagation: score threshold + class-agnostic greedy NMS
        cand = [t for t in active if regs[t][1] > self.reg_score_thr]
        cand.sort(key=lambda t: -regs[t][1])
        prop = []
        for t in cand:
            b = regs[t][0]
            if all(iou_matrix(b[None], regs[p][0][None])[0, 0]
                   <= self.reg_nms_iou for p in prop):
                prop.append(t)

        det_ok = det_scores > self.obj_score_thr
        if prop and n:
            pb = np.stack([regs[t][0] for t in prop])
            clash = (iou_matrix(det_boxes, pb)
                     >= self.reg_match_iou).any(axis=1)
            det_ok = det_ok & ~clash

        # ReID re-activation of lost (non-propagated) tracks
        ids = -np.ones(n, int)
        lost = [t for t in live if t not in prop]
        dleft = [i for i in range(n) if det_ok[i]]
        if lost and dleft:
            cost = np.full((len(lost), len(dleft)), BIG)
            for r, t in enumerate(lost):
                tr = self.tracks[t]
                temb = np.mean(tr.embeds, axis=0)
                for k, i in enumerate(dleft):
                    d = np.sqrt(((temb - det_embeds[i]) ** 2).sum())
                    iou = iou_matrix(tr.bbox[None],
                                     det_boxes[i][None])[0, 0]
                    if iou >= self.reid_iou_thr:
                        cost[r, k] = d
            rr, cc = linear_sum_assignment(cost)
            for r, c in zip(rr, cc):
                if cost[r, c] <= self.reid_score_thr:
                    ids[dleft[c]] = lost[r]

        for i in range(n):
            if det_ok[i] and ids[i] < 0:
                ids[i] = self.num_tracks
                self.num_tracks += 1

        # state update: propagated slots in place
        for t in prop:
            tr = self.tracks[t]
            tr.bbox = regs[t][0].copy()
            tr.embeds.append(emb_of(tr.bbox))
            tr.embeds = tr.embeds[-self.num_samples:]
            tr.last_frame = frame
        # detections (re-activated or new)
        for i in range(n):
            if not det_ok[i] or ids[i] < 0:
                continue
            tid = ids[i]
            if tid in self.tracks:
                tr = self.tracks[tid]
                tr.embeds.append(det_embeds[i].copy())
                tr.embeds = tr.embeds[-self.num_samples:]
            else:
                tr = _T()
                tr.embeds = [det_embeds[i].copy()]
                self.tracks[tid] = tr
            tr.bbox = det_boxes[i].copy()
            tr.label = det_labels[i]
            tr.last_frame = frame

        for t in list(self.tracks):
            if frame - self.tracks[t].last_frame >= self.retain:
                del self.tracks[t]
        return ids, sorted(prop)
