"""CLEAR / Identity / HOTA tracking metrics (host-side numpy).

The reference bridges to the TrackEval package
(/root/reference/mmtrack/evaluation/metrics/mot_drone_metrics.py:254-321);
that package is pure numpy and not available here, so the three metric
families are implemented from their definitions with the same matching
conventions TrackEval uses:

* CLEAR: per-frame Hungarian matching on IoU >= 0.5 with a large bonus for
  continuing the previous frame's match; MOTA/MOTP/IDSW/Frag/MT/PT/ML/TP/FP/FN.
* Identity: one global Hungarian over trajectory pairs maximizing IDTP
  (per-frame IoU >= 0.5 hits), giving IDF1/IDR/IDP.
* HOTA: 19 alpha thresholds; per-frame matching maximizes the global
  alignment (Jaccard) score; HOTA = mean_alpha sqrt(DetA * AssA).

Inputs are per-video dicts mapping frame -> (ids, boxes xyxy) arrays.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def _iou(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    if len(b1) == 0 or len(b2) == 0:
        return np.zeros((len(b1), len(b2)))
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-10)


class VideoData:
    """Dense per-video GT/pred storage with contiguous re-labelled ids."""

    def __init__(self, gt: Dict[int, Tuple[np.ndarray, np.ndarray]],
                 pred: Dict[int, Tuple[np.ndarray, np.ndarray]]):
        frames = sorted(set(gt) | set(pred))
        gt_idmap, tr_idmap = {}, {}
        self.gt_ids, self.tr_ids, self.sims = [], [], []
        for f in frames:
            gids, gboxes = gt.get(f, (np.zeros(0, int), np.zeros((0, 4))))
            tids, tboxes = pred.get(f, (np.zeros(0, int), np.zeros((0, 4))))
            for g in gids:
                gt_idmap.setdefault(int(g), len(gt_idmap))
            for t in tids:
                tr_idmap.setdefault(int(t), len(tr_idmap))
            self.gt_ids.append(
                np.array([gt_idmap[int(g)] for g in gids], int))
            self.tr_ids.append(
                np.array([tr_idmap[int(t)] for t in tids], int))
            self.sims.append(_iou(np.asarray(gboxes, float),
                                  np.asarray(tboxes, float)))
        self.num_gt_ids = len(gt_idmap)
        self.num_tr_ids = len(tr_idmap)
        self.num_gt_dets = sum(len(g) for g in self.gt_ids)
        self.num_tr_dets = sum(len(t) for t in self.tr_ids)


def clear_metrics(data: VideoData, threshold: float = 0.5) -> dict:
    num_gt_ids = data.num_gt_ids
    prev_tracker = np.full(num_gt_ids, -1)          # last matched tracker id
    prev_timestep_tracker = np.full(num_gt_ids, -1)
    gt_frame_count = np.zeros(num_gt_ids)
    gt_matched_count = np.zeros(num_gt_ids)
    gt_frag_state = np.full(num_gt_ids, -1)         # -1 unseen,0 lost,1 live
    frag = 0
    tp = fp = fn = idsw = 0
    motp_sum = 0.0

    for gids, tids, sim in zip(data.gt_ids, data.tr_ids, data.sims):
        gt_frame_count[gids] += 1
        if len(gids) == 0:
            fp += len(tids)
            prev_timestep_tracker = np.full(num_gt_ids, -1)
            continue
        if len(tids) == 0:
            fn += len(gids)
            for g in gids:
                if gt_frag_state[g] == 1:
                    gt_frag_state[g] = 0
            prev_timestep_tracker = np.full(num_gt_ids, -1)
            continue

        score = sim.copy()
        score[score < threshold - np.finfo(float).eps] = 0.0
        # continuation bonus: prefer keeping last-frame matches
        bonus = (prev_timestep_tracker[gids][:, None] == tids[None, :]) & \
            (score > 0)
        rows, cols = linear_sum_assignment(-(score + 1000.0 * bonus))
        matched = score[rows, cols] > 0
        rows, cols = rows[matched], cols[matched]

        n_match = len(rows)
        tp += n_match
        fn += len(gids) - n_match
        fp += len(tids) - n_match
        motp_sum += float(sim[rows, cols].sum())

        new_prev_t = np.full(num_gt_ids, -1)
        matched_gt = set()
        for r, c in zip(rows, cols):
            g, t = gids[r], tids[c]
            matched_gt.add(int(g))
            if prev_tracker[g] not in (-1, t):
                idsw += 1
            prev_tracker[g] = t
            new_prev_t[g] = t
            gt_matched_count[g] += 1
            if gt_frag_state[g] == 0:
                frag += 1
            gt_frag_state[g] = 1
        for g in gids:
            if int(g) not in matched_gt and gt_frag_state[g] == 1:
                gt_frag_state[g] = 0
        prev_timestep_tracker = new_prev_t

    seen = gt_frame_count > 0
    ratio = np.zeros(num_gt_ids)
    ratio[seen] = gt_matched_count[seen] / gt_frame_count[seen]
    mt = int(np.sum(seen & (ratio > 0.8)))
    ml = int(np.sum(seen & (ratio < 0.2)))
    pt = int(np.sum(seen)) - mt - ml
    num_gt = data.num_gt_dets
    mota = 1.0 - (fn + fp + idsw) / max(num_gt, 1)
    motp = motp_sum / max(tp, 1)
    return dict(MOTA=mota, MOTP=motp, IDSW=idsw, CLR_TP=tp, CLR_FP=fp,
                CLR_FN=fn, Frag=frag, MT=mt, PT=pt, ML=ml,
                CLR_Re=tp / max(tp + fn, 1), CLR_Pr=tp / max(tp + fp, 1),
                sMOTA=(tp * motp - fp - idsw) / max(num_gt, 1) -
                (0 if num_gt else 0))


def identity_metrics(data: VideoData, threshold: float = 0.5) -> dict:
    ng, nt = data.num_gt_ids, data.num_tr_ids
    matches = np.zeros((ng, nt))
    gt_count = np.zeros(ng)
    tr_count = np.zeros(nt)
    for gids, tids, sim in zip(data.gt_ids, data.tr_ids, data.sims):
        gt_count[gids] += 1
        tr_count[tids] += 1
        hit = sim >= threshold - np.finfo(float).eps
        for r, c in zip(*np.where(hit)):
            matches[gids[r], tids[c]] += 1
    # pad to square with fp/fn "tracks"
    size = ng + nt
    cost = np.zeros((size, size))
    cost[:ng, :nt] = matches
    rows, cols = linear_sum_assignment(-cost)
    idtp = cost[rows, cols].sum()
    idfn = data.num_gt_dets - idtp
    idfp = data.num_tr_dets - idtp
    return dict(
        IDTP=idtp, IDFN=idfn, IDFP=idfp,
        IDF1=idtp / max(idtp + 0.5 * idfn + 0.5 * idfp, 1e-10),
        IDR=idtp / max(idtp + idfn, 1e-10),
        IDP=idtp / max(idtp + idfp, 1e-10))


def hota_metrics(data: VideoData) -> dict:
    alphas = np.arange(0.05, 0.99, 0.05)
    ng, nt = data.num_gt_ids, data.num_tr_ids
    if ng == 0 or nt == 0:
        zero = np.zeros(len(alphas))
        det = zero if ng or nt else zero
        return dict(HOTA=0.0, DetA=0.0, AssA=0.0,
                    HOTA_alpha=zero, DetA_alpha=zero, AssA_alpha=zero)

    potential = np.zeros((ng, nt))
    gt_count = np.zeros(ng)
    tr_count = np.zeros(nt)
    for gids, tids, sim in zip(data.gt_ids, data.tr_ids, data.sims):
        gt_count[gids] += 1
        tr_count[tids] += 1
        if len(gids) and len(tids):
            denom = sim.sum(0)[None, :] + sim.sum(1)[:, None] - sim
            s = np.zeros_like(sim)
            nz = denom > 1e-10
            s[nz] = sim[nz] / denom[nz]
            potential[np.ix_(gids, tids)] += s
    global_align = potential / np.maximum(
        gt_count[:, None] + tr_count[None, :] - potential, 1e-10)

    tp_a = np.zeros(len(alphas))
    fn_a = np.zeros(len(alphas))
    fp_a = np.zeros(len(alphas))
    match_counts = [np.zeros((ng, nt)) for _ in alphas]
    for gids, tids, sim in zip(data.gt_ids, data.tr_ids, data.sims):
        if len(gids) == 0:
            fp_a += len(tids)
            continue
        if len(tids) == 0:
            fn_a += len(gids)
            continue
        score = global_align[np.ix_(gids, tids)] * sim
        rows, cols = linear_sum_assignment(-score)
        for ai, alpha in enumerate(alphas):
            ok = sim[rows, cols] >= alpha - np.finfo(float).eps
            ok &= sim[rows, cols] > 0
            tp = int(ok.sum())
            tp_a[ai] += tp
            fn_a[ai] += len(gids) - tp
            fp_a[ai] += len(tids) - tp
            match_counts[ai][gids[rows[ok]], tids[cols[ok]]] += 1

    det_a = tp_a / np.maximum(tp_a + fn_a + fp_a, 1e-10)
    ass_a = np.zeros(len(alphas))
    for ai in range(len(alphas)):
        mc = match_counts[ai]
        union = gt_count[:, None] + tr_count[None, :] - mc
        ass_iou = mc / np.maximum(union, 1e-10)
        # weighted by per-pair TP count
        total_tp = mc.sum()
        ass_a[ai] = (ass_iou * mc).sum() / max(total_tp, 1e-10)
    hota_alpha = np.sqrt(det_a * ass_a)
    return dict(HOTA=float(hota_alpha.mean()), DetA=float(det_a.mean()),
                AssA=float(ass_a.mean()), HOTA_alpha=hota_alpha,
                DetA_alpha=det_a, AssA_alpha=ass_a)


def combine_videos(datas: List[VideoData]) -> dict:
    """Evaluate each metric family over a list of per-video datasets and
    aggregate the way TrackEval does for MotChallenge (det counts summed,
    CLEAR recomputed from sums; HOTA averaged weighted by TPs is
    approximated by det-weighted mean)."""
    agg = {}
    clears = [clear_metrics(d) for d in datas]
    for k in ('CLR_TP', 'CLR_FP', 'CLR_FN', 'IDSW', 'Frag', 'MT', 'PT', 'ML'):
        agg[k] = sum(c[k] for c in clears)
    num_gt = sum(d.num_gt_dets for d in datas)
    agg['MOTA'] = 1.0 - (agg['CLR_FN'] + agg['CLR_FP'] + agg['IDSW']) / \
        max(num_gt, 1)
    motp_num = sum(c['MOTP'] * c['CLR_TP'] for c in clears)
    agg['MOTP'] = motp_num / max(agg['CLR_TP'], 1)

    idents = [identity_metrics(d) for d in datas]
    idtp = sum(i['IDTP'] for i in idents)
    idfn = sum(i['IDFN'] for i in idents)
    idfp = sum(i['IDFP'] for i in idents)
    agg['IDF1'] = idtp / max(idtp + 0.5 * idfn + 0.5 * idfp, 1e-10)
    agg['IDR'] = idtp / max(idtp + idfn, 1e-10)
    agg['IDP'] = idtp / max(idtp + idfp, 1e-10)

    hotas = [hota_metrics(d) for d in datas]
    weights = np.array([d.num_gt_dets for d in datas], float)
    weights = weights / max(weights.sum(), 1e-10)
    agg['HOTA'] = float(sum(w * h['HOTA'] for w, h in zip(weights, hotas)))
    agg['DetA'] = float(sum(w * h['DetA'] for w, h in zip(weights, hotas)))
    agg['AssA'] = float(sum(w * h['AssA'] for w, h in zip(weights, hotas)))
    return agg
