"""Independent numpy/scipy oracle for the StrongSORT association step
(reference mmtrack/models/trackers/strongsort_tracker.py:60-264 + the
SORT base semantics). Deliberately written in plain Python loops/dicts so
a shared bug with the fixed-slot JAX implementation is unlikely."""
import numpy as np
import scipy.linalg
from scipy.optimize import linear_sum_assignment

from oracle_tracker import cxcyah_to_xyxy, iou_matrix, xyxy_to_cxcyah
from test_kalman import NumpyKF

CHI2_4 = 9.4877
BIG = 1e6


class NSAKF(NumpyKF):
    def project_nsa(self, mean, cov, score, use_nsa):
        std = np.array([self._swp * mean[3], self._swp * mean[3], 1e-1,
                        self._swp * mean[3]])
        if use_nsa:
            std = std * (1.0 - score)
        r = np.diag(np.square(std))
        return self._update_mat @ mean, \
            self._update_mat @ cov @ self._update_mat.T + r

    def update_nsa(self, mean, cov, m, score, use_nsa):
        pm, pc = self.project_nsa(mean, cov, score, use_nsa)
        chol, lower = scipy.linalg.cho_factor(pc, lower=True)
        gain = scipy.linalg.cho_solve(
            (chol, lower), (cov @ self._update_mat.T).T).T
        return mean + (m - pm) @ gain.T, cov - gain @ pc @ gain.T


class _T:
    pass


class OracleStrongSORT:
    def __init__(self, obj_score_thr=0.6, match_score_thr=0.3,
                 motion_weight=0.02, match_iou_thr=0.7, num_tentatives=2,
                 num_frames_retain=30, with_reid=True, use_nsa=True):
        self.obj_score_thr = obj_score_thr
        self.match_score_thr = match_score_thr
        self.motion_weight = motion_weight
        self.match_iou_thr = match_iou_thr
        self.num_tentatives = num_tentatives
        self.retain = num_frames_retain
        self.with_reid = with_reid
        self.use_nsa = use_nsa
        self.kf = NSAKF()
        self.tracks = {}
        self.num_tracks = 0

    def step(self, boxes, scores, labels, embeds, frame):
        n = len(boxes)
        det_ok = scores > self.obj_score_thr
        live = sorted(self.tracks)

        # KF predict for every live track
        for tid in live:
            t = self.tracks[tid]
            t.mean, t.cov = self.kf.predict(t.mean, t.cov)

        meas = xyxy_to_cxcyah(boxes) if n else np.zeros((0, 4))
        ids = -np.ones(n, int)

        # ---- stage 1: confirmed tracks, appearance+motion -------------
        if self.with_reid:
            conf = [tid for tid in live
                    if self.tracks[tid].hits >= self.num_tentatives]
            if conf and det_ok.any():
                cost = np.full((len(conf), n), BIG)
                for r, tid in enumerate(conf):
                    t = self.tracks[tid]
                    maha = self.kf.gating_distance(t.mean, t.cov, meas)
                    temb = t.esum / t.ecnt
                    temb = temb / max(np.linalg.norm(temb), 1e-12)
                    demb = embeds / np.maximum(
                        np.linalg.norm(embeds, axis=1, keepdims=True),
                        1e-12)
                    rd = 1.0 - demb @ temb
                    c = ((1 - self.motion_weight) * rd
                         + self.motion_weight * maha)
                    c[maha > CHI2_4] = BIG
                    c[labels != t.label] = BIG
                    c[~det_ok] = BIG
                    cost[r] = c
                rr, cc = linear_sum_assignment(cost)
                for r, c in zip(rr, cc):
                    if cost[r, c] <= self.match_score_thr:
                        ids[c] = conf[r]

        # ---- stage 2: last-frame tracks on IoU of last observed box ---
        matched = set(int(x) for x in ids[ids >= 0])
        left = [tid for tid in live if tid not in matched
                and self.tracks[tid].last_frame == frame - 1]
        dleft = [i for i in range(n) if det_ok[i] and ids[i] < 0]
        if left and dleft:
            tb = np.stack([self.tracks[tid].bbox for tid in left])
            cost = 1.0 - iou_matrix(tb, boxes[dleft])
            for r, tid in enumerate(left):
                for k, i in enumerate(dleft):
                    if labels[i] != self.tracks[tid].label:
                        cost[r, k] += BIG
            rr, cc = linear_sum_assignment(cost)
            for r, c in zip(rr, cc):
                if cost[r, c] < 1 - self.match_iou_thr:
                    ids[dleft[c]] = left[r]

        # ---- new ids in detection order -------------------------------
        for i in range(n):
            if det_ok[i] and ids[i] < 0:
                ids[i] = self.num_tracks
                self.num_tracks += 1

        # ---- state update ---------------------------------------------
        for i in range(n):
            if not det_ok[i] or ids[i] < 0:
                continue
            tid = ids[i]
            if tid in self.tracks:
                t = self.tracks[tid]
                t.mean, t.cov = self.kf.update_nsa(
                    t.mean, t.cov, meas[i], scores[i], self.use_nsa)
                t.esum = t.esum + embeds[i]
                t.ecnt += 1
                t.hits += 1
            else:
                t = _T()
                t.mean, t.cov = self.kf.initiate(meas[i])
                t.esum = embeds[i].copy()
                t.ecnt = 1
                t.hits = 1
                t.label = labels[i]
                self.tracks[tid] = t
            t.bbox = boxes[i].copy()
            t.last_frame = frame

        # ---- eviction --------------------------------------------------
        for tid in list(self.tracks):
            t = self.tracks[tid]
            missed = t.last_frame < frame
            if (missed and t.hits < self.num_tentatives) \
                    or t.last_frame < frame - self.retain:
                del self.tracks[tid]
        return ids
