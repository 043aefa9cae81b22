"""Independent numpy oracle for the QDTrack (QuasiDenseTracker)
association step (reference
mmtrack/models/trackers/quasi_dense_tracker.py:83-302), written with
plain Python dict-of-tracks state and per-frame lists."""
import numpy as np

from oracle_tracker import iou_matrix


class _T:
    pass


class OracleQDTrack:
    def __init__(self, init_score_thr=0.8, obj_score_thr=0.5,
                 match_score_thr=0.5, memo_tracklet_frames=10,
                 num_backdrops=1, memo_momentum=0.8,
                 nms_conf_thr=0.5, nms_backdrop_iou_thr=0.3,
                 nms_class_iou_thr=0.7, with_cats=True):
        self.init_score_thr = init_score_thr
        self.obj_score_thr = obj_score_thr
        self.match_score_thr = match_score_thr
        self.retain = memo_tracklet_frames
        self.num_backdrops = num_backdrops
        self.momentum = memo_momentum
        self.nms_conf_thr = nms_conf_thr
        self.nms_backdrop_iou = nms_backdrop_iou_thr
        self.nms_class_iou = nms_class_iou_thr
        self.with_cats = with_cats
        self.tracks = {}
        self.backdrops = []     # list of (bbox, embed, label)
        self.num_tracks = 0

    def step(self, bboxes, scores, labels, embeds, frame):
        n = len(bboxes)
        order = np.argsort(-scores, kind='stable')
        inv = np.argsort(order, kind='stable')
        bboxes, scores = bboxes[order], scores[order]
        labels, embeds = labels[order], embeds[order]

        ious = iou_matrix(bboxes, bboxes) if n else np.zeros((0, 0))
        keep = np.ones(n, bool)
        for i in range(n):
            thr = self.nms_backdrop_iou if scores[i] < self.obj_score_thr \
                else self.nms_class_iou
            for j in range(i):
                if keep[j] and ious[i, j] > thr:
                    keep[i] = False
                    break

        mem_ids = sorted(self.tracks)
        m_emb = [self.tracks[t].embed for t in mem_ids] + \
            [b[1] for b in self.backdrops]
        m_lab = [self.tracks[t].label for t in mem_ids] + \
            [b[2] for b in self.backdrops]
        m_id = mem_ids + [-1] * len(self.backdrops)
        ids = -np.ones(n, int)
        if m_emb and keep.any():
            m_emb = np.stack(m_emb)
            ki = np.flatnonzero(keep)
            feats = embeds[ki] @ m_emb.T                 # (K, M)
            e1 = np.exp(feats - feats.max(axis=1, keepdims=True))
            d2t = e1 / e1.sum(axis=1, keepdims=True)
            e0 = np.exp(feats - feats.max(axis=0, keepdims=True))
            t2d = e0 / e0.sum(axis=0, keepdims=True)
            match = (d2t + t2d) / 2
            if self.with_cats:
                match = match * (labels[ki][:, None]
                                 == np.asarray(m_lab)[None, :])
            for r, i in enumerate(ki):
                conf = match[r].max()
                ind = int(match[r].argmax())
                mid = m_id[ind]
                if conf > self.match_score_thr and mid > -1:
                    if scores[i] > self.obj_score_thr:
                        ids[i] = mid
                        match[np.arange(len(ki)) != r, ind] = 0.0
                    elif conf > self.nms_conf_thr:
                        ids[i] = -2

        for i in range(n):
            if keep[i] and ids[i] == -1 \
                    and scores[i] > self.init_score_thr:
                ids[i] = self.num_tracks
                self.num_tracks += 1

        for i in range(n):
            if not keep[i] or ids[i] <= -1:
                continue
            tid = ids[i]
            if tid in self.tracks:
                t = self.tracks[tid]
                dt = max(frame - t.last_frame, 1)
                v_new = (bboxes[i] - t.bbox) / dt
                t.velocity = (t.velocity * t.acc + v_new) / (t.acc + 1)
                t.acc += 1
                t.embed = (1 - self.momentum) * t.embed \
                    + self.momentum * embeds[i]
            else:
                t = _T()
                t.velocity = np.zeros(4)
                t.acc = 0
                t.embed = embeds[i].copy()
                self.tracks[tid] = t
            t.bbox = bboxes[i].copy()
            t.label = labels[i]
            t.score = scores[i]
            t.last_frame = frame

        for tid in list(self.tracks):
            if frame - self.tracks[tid].last_frame >= self.retain:
                del self.tracks[tid]

        # backdrops: unmatched kept dets deduped vs ALL earlier dets
        bd = []
        for i in range(n):
            if not (keep[i] and ids[i] == -1):
                continue
            if any(ious[i, j] > self.nms_backdrop_iou
                   for j in range(i)):
                continue
            bd.append((bboxes[i].copy(), embeds[i].copy(),
                       int(labels[i])))
        self.backdrops = bd[:self.num_backdrops]
        return ids[inv]
