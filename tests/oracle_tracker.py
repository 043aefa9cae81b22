"""Test-only numpy oracle replicating the reference OC-SORT-with-depth
tracker semantics (dict-of-tracks, per-track float64 Kalman states).

This mirrors the behavior documented from
/root/reference/mmtrack/models/trackers/ocsort_tracker_disparity.py and its
bases; it exists purely to A/B the fixed-shape JAX tracker and is never
shipped or imported by the package.
"""
import numpy as np
from scipy.optimize import linear_sum_assignment

from test_kalman import NumpyKF


def lapjv_limit(cost, limit):
    n, m = cost.shape
    if n == 0 or m == 0:
        return np.full(n, -1, int), np.full(m, -1, int)
    ext = np.full((n + m, n + m), limit / 2.0)
    ext[n:, m:] = 0.0
    ext[:n, :m] = cost
    rr, cc = linear_sum_assignment(ext)
    row = np.full(n, -1, int)
    col = np.full(m, -1, int)
    for r, c in zip(rr, cc):
        if r < n and c < m:
            row[r] = c
            col[c] = r
    return row, col


def xyxy_to_cxcyah(b):
    b = np.asarray(b, float)
    cx = (b[..., 0] + b[..., 2]) / 2
    cy = (b[..., 1] + b[..., 3]) / 2
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    return np.stack([cx, cy, w / h, h], -1)


def cxcyah_to_xyxy(s):
    cx, cy, a, h = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    w = a * h
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def iou_matrix(b1, b2):
    if len(b1) == 0 or len(b2) == 0:
        return np.zeros((len(b1), len(b2)))
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-6)


class _Track:
    pass


class OracleTracker:
    def __init__(self, obj_score_thr=0.3, init_track_thr=0.7,
                 weight_iou_with_det_scores=False, match_iou_thr=0.1,
                 num_tentatives=3, vel_consist_weight=0.2, vel_delta_t=3,
                 num_frames_retain=30):
        self.obj_score_thr = obj_score_thr
        self.init_track_thr = init_track_thr
        self.weight_iou = weight_iou_with_det_scores
        self.match_iou_thr = match_iou_thr
        self.num_tentatives = num_tentatives
        self.vel_w = vel_consist_weight
        self.delta_t = vel_delta_t
        self.retain = num_frames_retain
        self.kf = NumpyKF()
        self.reset()

    def reset(self):
        self.tracks = {}
        self.num_tracks = 0

    # ---- helpers -------------------------------------------------------
    def last_obs(self, t):
        for b in t.obs[::-1]:
            if b is not None:
                return b

    def k_step_obs(self, t):
        n = len(t.obs)
        if n > self.delta_t and t.obs[n - 1 - self.delta_t] is not None:
            return t.obs[n - 1 - self.delta_t]
        return self.last_obs(t)

    def vel_dir(self, b1, b2):
        if b1.sum() < 0 or b2.sum() < 0:
            return np.array([-1.0, -1.0])
        c1 = np.array([(b1[0] + b1[2]) / 2, (b1[1] + b1[3]) / 2])
        c2 = np.array([(b2[0] + b2[2]) / 2, (b2[1] + b2[3]) / 2])
        speed = np.array([c2[1] - c1[1], c2[0] - c1[0]])
        return speed / (np.linalg.norm(speed) + 1e-6)

    def _ocm_cost(self, ids, det_boxes, det_scores):
        tb = np.stack([self.tracks[i].mean[:4] for i in ids])
        tb = cxcyah_to_xyxy(tb)
        ious = iou_matrix(tb, det_boxes)
        if self.weight_iou:
            ious = ious * det_scores[None, :]
        cost = 1.0 - ious
        if len(ids) and len(det_boxes):
            vels = np.stack([self.tracks[i].velocity for i in ids])
            kobs = np.stack([self.k_step_obs(self.tracks[i]) for i in ids])
            valid = (vels.sum(1) != -2) & (kobs.sum(1) != -4)
            c_from = np.stack([(kobs[:, 0] + kobs[:, 2]) / 2,
                               (kobs[:, 1] + kobs[:, 3]) / 2], -1)
            c_to = np.stack([(det_boxes[:, 0] + det_boxes[:, 2]) / 2,
                             (det_boxes[:, 1] + det_boxes[:, 3]) / 2], -1)
            dy = c_to[None, :, 1] - c_from[:, None, 1]
            dx = c_to[None, :, 0] - c_from[:, None, 0]
            norm = np.sqrt(dy ** 2 + dx ** 2) + 1e-6
            dirs = np.stack([dy / norm, dx / norm], -1)
            cosang = np.clip((dirs * vels[:, None, :]).sum(-1), -1, 1)
            norm_angle = (np.arccos(cosang) - np.pi / 2) / np.pi
            cost += norm_angle * valid[:, None] * self.vel_w
        return cost

    def _init_track(self, tid, box, score, label, scale, depth, frame):
        t = _Track()
        t.tentative = frame != 0
        t.mean, t.cov = self.kf.initiate(xyxy_to_cxcyah(box))
        t.obs = [box.copy()]
        t.last_bbox = box.copy()
        t.tracked = True
        t.saved = None
        t.velocity = np.array([-1.0, -1.0])
        t.last_frame = frame
        t.hits = 1
        t.score, t.label, t.scale, t.depth = score, label, scale, depth
        self.tracks[tid] = t

    def _update_track(self, tid, box, score, label, scale, depth, frame):
        t = self.tracks[tid]
        t.hits += 1
        if t.tentative and t.hits >= self.num_tentatives:
            t.tentative = False
        t.mean, t.cov = self.kf.update(t.mean, t.cov, xyxy_to_cxcyah(box))
        t.tracked = True
        t.obs.append(box.copy())
        t.velocity = self.vel_dir(self.k_step_obs(t), box)
        t.last_bbox = box.copy()
        t.last_frame = frame
        t.score, t.label, t.scale, t.depth = score, label, scale, depth

    def _online_smooth(self, t, box):
        last = self.last_obs(t)
        unmatch = 0
        for b in t.obs[::-1]:
            if b is None:
                unmatch += 1
            else:
                break
        shift = (box - last) / (unmatch + 1)
        t.mean, t.cov = t.saved[0].copy(), t.saved[1].copy()
        for i in range(unmatch):
            virtual = last + (i + 1) * shift
            t.mean, t.cov = self.kf.update(t.mean, t.cov,
                                           xyxy_to_cxcyah(virtual))

    # ---- main ----------------------------------------------------------
    def step(self, boxes, scores, labels, scales, depths, frame):
        boxes = np.asarray(boxes, float).reshape(-1, 4)
        scores = np.asarray(scores, float)
        labels = np.asarray(labels, int)
        scales = np.asarray(scales, float)
        depths = np.asarray(depths, float)
        if frame == 0:
            self.reset()

        if not self.tracks or len(boxes) == 0:
            keep = scores > self.init_track_thr
            ids = np.arange(self.num_tracks, self.num_tracks + keep.sum())
            self.num_tracks += keep.sum()
            out = list(zip(ids, boxes[keep], scores[keep], labels[keep],
                           scales[keep], depths[keep]))
            for tid, b, s, l, sc, d in out:
                self._init_track(int(tid), b, s, l, sc, d, frame)
            self._evict(frame)
            return {int(i): b for i, b, *_ in out}

        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        gate = (scores > self.obj_score_thr) & (area > 100)
        db, ds, dl = boxes[gate], scores[gate], labels[gate]
        dsc, dd = scales[gate], depths[gate]
        det_ids = np.full(len(db), -1, int)

        confirmed = [i for i, t in self.tracks.items() if not t.tentative]
        tentative = [i for i, t in self.tracks.items() if t.tentative]

        for i in confirmed:
            t = self.tracks[i]
            if t.last_frame != frame - 1:
                t.mean[7] = 0.0
            if t.tracked:
                t.saved = (t.mean.copy(), t.cov.copy())
            t.mean, t.cov = self.kf.predict(t.mean, t.cov)

        # OCM vs confirmed
        cost = self._ocm_cost(confirmed, db, ds) if confirmed else \
            np.zeros((0, len(db)))
        _, col = lapjv_limit(cost, 1 - self.match_iou_thr)
        for j, r in enumerate(col):
            if r >= 0:
                det_ids[j] = confirmed[r]

        # OCM vs tentative with leftovers
        left = np.where(det_ids == -1)[0]
        if tentative:
            cost = self._ocm_cost(tentative, db[left], ds[left])
            _, col = lapjv_limit(cost, 1 - self.match_iou_thr)
            for jj, r in enumerate(col):
                if r >= 0:
                    det_ids[left[jj]] = tentative[r]

        # OCR for unmatched tracks
        unmatched_tracks = [i for i in self.tracks if i not in det_ids]
        left = np.where(det_ids == -1)[0]
        if unmatched_tracks and len(left):
            lo = np.stack([self.last_obs(self.tracks[i])
                           for i in unmatched_tracks])
            ious = iou_matrix(lo, db[left])
            if self.weight_iou:
                ious = ious * ds[left][None, :]
            _, col = lapjv_limit(1 - ious, 1 - self.match_iou_thr)
            for jj, r in enumerate(col):
                if r >= 0:
                    det_ids[left[jj]] = unmatched_tracks[r]

        # smoothing for recovered, mark lost for unmatched
        for j in np.where(det_ids >= 0)[0]:
            t = self.tracks[det_ids[j]]
            if not t.tracked:
                self._online_smooth(t, db[j])
        for i in self.tracks:
            if i not in det_ids:
                self.tracks[i].tracked = False
                self.tracks[i].obs.append(None)

        # new ids for leftovers (det order)
        new = det_ids == -1
        det_ids[new] = np.arange(self.num_tracks, self.num_tracks + new.sum())
        self.num_tracks += new.sum()

        # updates / inits
        for j, tid in enumerate(det_ids):
            if tid in self.tracks:
                self._update_track(int(tid), db[j], ds[j], dl[j], dsc[j],
                                   dd[j], frame)
            else:
                self._init_track(int(tid), db[j], ds[j], dl[j], dsc[j],
                                 dd[j], frame)
        self._evict(frame)
        return {int(tid): db[j] for j, tid in enumerate(det_ids)}

    def _evict(self, frame):
        dead = [i for i, t in self.tracks.items()
                if frame - t.last_frame >= self.retain
                or (t.tentative and t.last_frame != frame)]
        for i in dead:
            del self.tracks[i]
