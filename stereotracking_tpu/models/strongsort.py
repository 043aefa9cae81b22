"""StrongSORT / DeepSORT / SORT tracker family, fixed-slot TPU-native.

Re-creates /root/reference/mmtrack/models/trackers/strongsort_tracker.py
(and its SORT base semantics):

* detections filtered at ``obj_score_thr`` (:148-151);
* stage 1 — confirmed tracks x dets on a blended appearance+motion cost:
  ``(1-w)*cosine + w*maha`` with chi^2-gated motion distances poisoning
  the pair (:177-204), class-mismatch +1e6, Hungarian, accept
  ``dist <= match_score_thr``;
* stage 2 — still-unmatched tracks seen on the previous frame x leftover
  dets on ``1 - IoU`` (+class cost), accept ``< 1 - match_iou_thr``
  (:206-230);
* new ids in detection order (:232-238); NSA Kalman update with the
  detection score (update_track :74-92); per-track mean appearance
  embedding (momentum-free history mean, kept exactly as a running
  (sum, count) pair); tentative confirmation after ``num_tentatives``
  hits and eviction after ``num_frames_retain`` missed frames.

``DeepSORT`` = StrongSORT without NSA (plain Kalman update); ``SORT`` =
motion+IoU only (stage 1 skipped). One jitted step; state is a pytree.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.assignment import linear_assignment_with_limit
from ..structures.bbox import bbox_cxcyah_to_xyxy, bbox_xyxy_to_cxcyah
from . import kalman

_BIG = 1e6


class StrongSORTConfig(NamedTuple):
    num_slots: int = 64
    obj_score_thr: float = 0.6
    match_score_thr: float = 0.3
    motion_weight: float = 0.02
    match_iou_thr: float = 0.7
    num_tentatives: int = 2
    num_frames_retain: int = 30
    embed_dim: int = 256
    with_reid: bool = True       # False -> SORT (motion/IoU only)
    use_nsa: bool = True         # False -> DeepSORT-style plain update


class SSTrackState(NamedTuple):
    mean: jnp.ndarray            # (K, 8)
    cov: jnp.ndarray             # (K, 8, 8)
    bbox: jnp.ndarray            # (K, 4) last observed xyxy
    score: jnp.ndarray           # (K,)
    label: jnp.ndarray           # (K,)
    ids: jnp.ndarray             # (K,)
    embed_sum: jnp.ndarray       # (K, E)
    embed_cnt: jnp.ndarray       # (K,)
    hits: jnp.ndarray            # (K,)
    last_frame: jnp.ndarray      # (K,)
    valid: jnp.ndarray           # (K,)
    num_tracks: jnp.ndarray      # ()


def init_state(cfg: StrongSORTConfig) -> SSTrackState:
    k, e = cfg.num_slots, cfg.embed_dim
    return SSTrackState(
        jnp.zeros((k, 8)), jnp.zeros((k, 8, 8)), jnp.zeros((k, 4)),
        jnp.zeros((k,)), jnp.zeros((k,), jnp.int32),
        jnp.full((k,), -1, jnp.int32), jnp.zeros((k, e)),
        jnp.zeros((k,)), jnp.zeros((k,), jnp.int32),
        jnp.full((k,), -(10 ** 6), jnp.int32), jnp.zeros((k,), bool),
        jnp.zeros((), jnp.int32))


def _solve(cost, row_mask, col_mask):
    """Hungarian over masked rows/cols (scipy linear_sum_assignment
    semantics: full min-cost matching; caller filters by threshold)."""
    c = jnp.where(row_mask[:, None] & col_mask[None, :], cost, _BIG)
    row_assign, _ = linear_assignment_with_limit(
        c, row_mask, col_mask, _BIG / 2)
    return row_assign


def _iou(b1, b2):
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = jnp.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / jnp.maximum(a1[:, None] + a2[None] - inter, 1e-10)


@partial(jax.jit, static_argnames=('cfg',))
def strongsort_step(state: SSTrackState, bboxes, scores, labels, embeds,
                    det_valid, frame_id, cfg: StrongSORTConfig,
                    warp: Optional[jnp.ndarray] = None):
    """One association step. ``bboxes`` (N, 4) xyxy, ``embeds`` (N, E)
    (zeros when with_reid=False), ``det_valid`` (N,) bool.
    Returns (new_state, ids (N,) — -1 for dropped detections)."""
    k = cfg.num_slots
    n = bboxes.shape[0]
    det_valid = det_valid & (scores > cfg.obj_score_thr)

    confirmed = state.valid & (state.hits >= cfg.num_tentatives)

    # optional camera-motion warp of the Kalman means (cmc hook)
    mean = state.mean
    if warp is not None:
        from ..ops.gmc import apply_warp_to_cxcyah
        mean = jnp.where(state.valid[:, None],
                         apply_warp_to_cxcyah(mean, warp), mean)

    # KF predict for all live tracks
    pm, pc = jax.vmap(kalman.predict)(mean, state.cov)
    mean = jnp.where(state.valid[:, None], pm, mean)
    cov = jnp.where(state.valid[:, None, None], pc, state.cov)

    meas = bbox_xyxy_to_cxcyah(bboxes)
    motion = jax.vmap(lambda m, c: kalman.gating_distance(m, c, meas))(
        mean, cov)                                  # (K, N)
    gate = motion > kalman.KalmanParams().gating_threshold

    label_cost = jnp.where(
        state.label[:, None] == labels[None, :], 0.0, _BIG)

    ids = jnp.full((n,), -1, jnp.int32)
    matched_slot = jnp.full((n,), -1, jnp.int32)

    if cfg.with_reid:
        t_emb = state.embed_sum / jnp.maximum(state.embed_cnt[:, None], 1)
        t_emb = t_emb / jnp.maximum(
            jnp.linalg.norm(t_emb, axis=1, keepdims=True), 1e-12)
        d_emb = embeds / jnp.maximum(
            jnp.linalg.norm(embeds, axis=1, keepdims=True), 1e-12)
        reid_dist = 1.0 - t_emb @ d_emb.T           # (K, N)
        cost1 = jnp.where(gate, _BIG,
                          (1 - cfg.motion_weight) * reid_dist
                          + cfg.motion_weight * motion) + label_cost
        r1 = _solve(cost1, confirmed, det_valid)
        ok1 = (r1 >= 0) & (jnp.take_along_axis(
            cost1, jnp.clip(r1, 0, n - 1)[:, None], axis=1)[:, 0]
            <= cfg.match_score_thr)
        slot_of_det = jnp.full((n,), -1, jnp.int32).at[
            jnp.where(ok1, r1, n)].set(jnp.arange(k), mode='drop')
        matched_slot = slot_of_det
        ids = jnp.where(matched_slot >= 0, state.ids[matched_slot], -1)

    # stage 2: IoU on tracks active last frame and still unmatched
    taken = jnp.zeros((k,), bool).at[
        jnp.where(matched_slot >= 0, matched_slot, k)].set(
            True, mode='drop')
    active2 = state.valid & ~taken & (state.last_frame == frame_id - 1)
    det_left = det_valid & (ids < 0)
    # reference uses the LAST OBSERVED bbox ('bboxes' memo), not the
    # predicted one (:218-221)
    cost2 = 1.0 - _iou(state.bbox, bboxes) + label_cost
    r2 = _solve(cost2, active2, det_left)
    ok2 = (r2 >= 0) & (jnp.take_along_axis(
        cost2, jnp.clip(r2, 0, n - 1)[:, None], axis=1)[:, 0]
        < 1 - cfg.match_iou_thr)
    slot2 = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(ok2, r2, n)].set(jnp.arange(k), mode='drop')
    matched_slot = jnp.where(matched_slot >= 0, matched_slot, slot2)
    ids = jnp.where((ids < 0) & (slot2 >= 0), state.ids[slot2], ids)

    # new ids in detection order
    is_new = det_valid & (ids < 0)
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    ids = jnp.where(is_new, state.num_tracks + new_rank, ids)
    num_tracks = state.num_tracks + is_new.sum()

    # ---- state update ---------------------------------------------------
    # matched tracks: NSA Kalman update; new tracks: initiate into a free
    # (or stalest) slot
    def upd_det(i, st):
        mean_, cov_, bbox_, score_, label_, ids_, esum, ecnt, hits, lastf, \
            valid = st
        keep = det_valid[i] & (ids[i] >= 0)
        slot = matched_slot[i]
        is_new_i = keep & (slot < 0)
        free = ~valid
        stale = jnp.argmin(jnp.where(valid, lastf, -(10 ** 9)))
        new_slot = jnp.where(free.any(), jnp.argmax(free), stale)
        s = jnp.where(slot >= 0, slot, new_slot)

        m_upd, c_upd = kalman.update(
            mean_[s], cov_[s], meas[i], scores[i],
            use_nsa=cfg.use_nsa)
        m_new, c_new = kalman.initiate(meas[i])
        m = jnp.where(is_new_i, m_new, m_upd)
        c = jnp.where(is_new_i, c_new, c_upd)

        def w(a, v):
            return a.at[s].set(jnp.where(keep, v, a[s]))

        return (w(mean_, m), w(cov_, c), w(bbox_, bboxes[i]),
                w(score_, scores[i]), w(label_, labels[i]), w(ids_, ids[i]),
                w(esum, jnp.where(is_new_i, embeds[i],
                                  esum[s] + embeds[i])),
                w(ecnt, jnp.where(is_new_i, 1.0, ecnt[s] + 1.0)),
                w(hits, jnp.where(is_new_i, 1, hits[s] + 1)),
                w(lastf, frame_id), w(valid, True))

    upd = jax.lax.fori_loop(
        0, n, upd_det,
        (mean, cov, state.bbox, state.score, state.label, state.ids,
         state.embed_sum, state.embed_cnt, state.hits, state.last_frame,
         state.valid))
    (mean, cov, bbox, score, label, sids, esum, ecnt, hits, lastf,
     valid) = upd

    # eviction: tentative tracks that missed this frame die immediately;
    # confirmed tracks die after num_frames_retain missed frames
    missed = valid & (lastf < frame_id)
    tentative = hits < cfg.num_tentatives
    evict = (missed & tentative) | (lastf < frame_id - cfg.num_frames_retain)
    valid = valid & ~evict

    new_state = SSTrackState(mean, cov, bbox, score, label, sids, esum,
                             ecnt, hits, lastf, valid, num_tracks)
    return new_state, ids


def crop_resize_boxes(img: jnp.ndarray, boxes: jnp.ndarray,
                      out_hw: Tuple[int, int] = (256, 128)) -> jnp.ndarray:
    """Bilinear crop+resize of each xyxy box for the ReID model
    (BaseTracker.crop_imgs semantics: boxes clipped to the image,
    align_corners=False resize). img (H, W, C) -> (N, oh, ow, C)."""
    h, w, _ = img.shape
    oh, ow = out_hw
    x1 = jnp.clip(boxes[:, 0], 0, w - 1)
    y1 = jnp.clip(boxes[:, 1], 0, h - 1)
    x2 = jnp.clip(boxes[:, 2], 1, w)
    y2 = jnp.clip(boxes[:, 3], 1, h)

    def one(x1i, y1i, x2i, y2i):
        ys = y1i + (jnp.arange(oh) + 0.5) * (y2i - y1i) / oh - 0.5
        xs = x1i + (jnp.arange(ow) + 0.5) * (x2i - x1i) / ow - 0.5
        ys = jnp.clip(ys, 0, h - 1)
        xs = jnp.clip(xs, 0, w - 1)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1_ = jnp.minimum(y0 + 1, h - 1)
        x1_ = jnp.minimum(x0 + 1, w - 1)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        rows0 = img[y0]
        rows1 = img[y1_]
        row = rows0 * (1 - fy) + rows1 * fy           # (oh, W, C)
        c0 = row[:, x0]
        c1 = row[:, x1_]
        return c0 * (1 - fx) + c1 * fx

    return jax.vmap(one)(x1, y1, x2, y2)


class StrongSORTStreaming:
    """Per-frame streaming StrongSORT: YOLOX detections + ReID crop
    embeddings -> the fixed-slot association step (the composition of the
    reference StrongSORT model: detector + reid + kalman + tracker +
    optional cmc/AFLink/GSI postprocessing)."""

    def __init__(self, det_variables, reid_variables,
                 det_cfg=None, cfg: StrongSORTConfig = StrongSORTConfig(),
                 reid_hw: Tuple[int, int] = (256, 128),
                 input_shape: Tuple[int, int] = (736, 1280),
                 dtype=jnp.float32):
        import jax as _jax

        from .detector import DetectorConfig, YOLOXDetector, detector_predict
        from .reid import BaseReID

        self.cfg = cfg
        self.det_cfg = det_cfg or DetectorConfig()
        self.module = YOLOXDetector(self.det_cfg, dtype=dtype)
        self.det_variables = det_variables
        self.reid = BaseReID(embed_dim=cfg.embed_dim, num_classes=1)
        self.reid_variables = reid_variables
        self.reid_hw = reid_hw
        self.state = init_state(cfg)
        self._frame = jnp.int32(0)

        n = cfg.num_slots

        def detect(variables, inputs):
            res = detector_predict(variables, self.module, inputs)
            return (res.boxes[:n], res.scores[:n], res.labels[:n],
                    res.valid[:n])

        self._detect = _jax.jit(detect)

        def embed(reid_vars, img, boxes):
            crops = crop_resize_boxes(img, boxes, reid_hw)
            emb, _ = self.reid.apply(reid_vars, crops, train=False)
            return emb

        self._embed = _jax.jit(embed)

    def reset(self):
        self.state = init_state(self.cfg)
        self._frame = jnp.int32(0)

    def track(self, inputs: dict, frame_id: int,
              warp=None):
        """``inputs`` from preprocess_frame (dict of NHWC tensors).
        Returns dict(bboxes, scores, labels, instances_id, valid)."""
        if frame_id == 0:
            self.reset()
        boxes, scores, labels, valid = self._detect(self.det_variables,
                                                    inputs)
        embeds = self._embed(self.reid_variables, inputs['img'][0], boxes)
        self.state, ids = strongsort_step(
            self.state, boxes, scores, labels, embeds, valid,
            jnp.int32(frame_id), self.cfg, warp=warp)
        return dict(bboxes=boxes, scores=scores, labels=labels,
                    instances_id=ids, valid=valid & (ids >= 0))
