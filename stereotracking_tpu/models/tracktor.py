"""Tracktor: detector-regression tracking with ReID re-activation,
fixed-slot TPU-native.

Re-creates /root/reference/mmtrack/models/trackers/tracktor_tracker.py:

* previous-frame track boxes are REGRESSED onto the new frame by the
  detector's RoI bbox head (regress_tracks :67-105): class-0 NMS at 0.6,
  keep score > 0.5, ids carried through;
* new detections overlapping any propagated box at IoU >= 0.3 are
  dropped (:196-201);
* lost tracks (not propagated) are re-activated by euclidean embedding
  distance against the remaining detections, pairs below 0.2 IoU with
  the track's last box forbidden, accept distance <= 2.0 (:203-232);
* leftovers start new ids; per-track embedding memory is the mean of the
  last ``num_samples`` embeddings (a fixed ring buffer here);
* optional CMC / LinearMotion hooks adjust track boxes before regression
  (:178-189 — pass ``warp``/pre-warped state).

The regression itself is a caller-provided jitted function of the
two-stage core (see ``make_regress_fn``) so Tracktor stays detector-
agnostic exactly like the reference (any model with a roi_head).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.assignment import linear_assignment_with_limit

_BIG = 1e6


class TracktorConfig(NamedTuple):
    num_slots: int = 64
    obj_score_thr: float = 0.5
    regression_score_thr: float = 0.5
    regression_nms_iou: float = 0.6
    regression_match_iou: float = 0.3
    reid_match_score_thr: float = 2.0
    reid_match_iou_thr: float = 0.2
    num_samples: int = 10
    embed_dim: int = 256
    num_frames_retain: int = 10


class TracktorState(NamedTuple):
    bbox: jnp.ndarray            # (K, 4) last box
    label: jnp.ndarray           # (K,)
    ids: jnp.ndarray             # (K,)
    embeds: jnp.ndarray          # (K, S, E) ring of last embeddings
    embed_cnt: jnp.ndarray       # (K,)
    last_frame: jnp.ndarray     # (K,)
    valid: jnp.ndarray          # (K,)
    num_tracks: jnp.ndarray     # ()


def init_state(cfg: TracktorConfig) -> TracktorState:
    k = cfg.num_slots
    return TracktorState(
        jnp.zeros((k, 4)), jnp.zeros((k,), jnp.int32),
        jnp.full((k,), -1, jnp.int32),
        jnp.zeros((k, cfg.num_samples, cfg.embed_dim)),
        jnp.zeros((k,)), jnp.full((k,), -(10 ** 6), jnp.int32),
        jnp.zeros((k,), bool), jnp.zeros((), jnp.int32))


def _iou(b1, b2):
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = jnp.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / jnp.maximum(a1[:, None] + a2[None] - inter, 1e-10)


def _greedy_nms(boxes, scores, valid, iou_thr, k):
    """Score-ordered greedy NMS over fixed slots."""
    order = jnp.argsort(jnp.where(valid, -scores, 1e9))
    b = boxes[order]
    v = valid[order]
    ious = _iou(b, b)

    def body(i, keep):
        earlier = (jnp.arange(k) < i) & keep
        clash = ((ious[i] > iou_thr) & earlier).any()
        return keep.at[i].set(keep[i] & ~clash)

    keep = jax.lax.fori_loop(0, k, body, v)
    inv = jnp.argsort(order)
    return keep[inv]


@partial(jax.jit, static_argnames=('cfg',))
def tracktor_step(state: TracktorState,
                  reg_boxes, reg_scores,           # regressed track boxes
                  det_bboxes, det_scores, det_labels, det_embeds,
                  det_valid, prop_embeds, frame_id, cfg: TracktorConfig):
    """One Tracktor step.

    ``reg_boxes/reg_scores`` (K,·) are the RoI-head regressions of each
    slot's previous box (from ``make_regress_fn``); ``prop_embeds`` (K, E)
    the ReID embeddings of the regressed boxes. Returns
    (new_state, out) where out = (bboxes (K+N, 4), scores, labels, ids,
    valid) — propagated tracks first, then surviving detections,
    matching the reference's output concatenation (:236-241)."""
    k = cfg.num_slots
    n = det_bboxes.shape[0]

    was_active = state.valid & (state.last_frame == frame_id - 1)
    # regression keep: score thr + class-agnostic NMS (regress_tracks)
    prop = was_active & (reg_scores > cfg.regression_score_thr)
    prop = prop & _greedy_nms(reg_boxes, reg_scores, prop,
                              cfg.regression_nms_iou, k)

    det_valid = det_valid & (det_scores > cfg.obj_score_thr)
    # drop detections near any propagated box
    ious_dp = _iou(det_bboxes, reg_boxes)
    clash = ((ious_dp >= cfg.regression_match_iou)
             & prop[None, :]).any(axis=1)
    det_valid = det_valid & ~clash

    # ReID re-activation of lost tracks
    lost = state.valid & ~prop
    t_emb = state.embeds.sum(axis=1) / jnp.maximum(
        state.embed_cnt[:, None], 1)
    dists = jnp.sqrt(jnp.maximum(
        ((t_emb[:, None, :] - det_embeds[None, :, :]) ** 2).sum(-1), 0))
    iou_last = _iou(state.bbox, det_bboxes)
    dists = jnp.where(iou_last < cfg.reid_match_iou_thr, _BIG, dists)
    dists = jnp.where(lost[:, None] & det_valid[None, :], dists, _BIG)
    r, _ = linear_assignment_with_limit(dists, lost, det_valid, _BIG / 2)
    ok = (r >= 0) & (jnp.take_along_axis(
        dists, jnp.clip(r, 0, n - 1)[:, None], axis=1)[:, 0]
        <= cfg.reid_match_score_thr)
    react_slot_of_det = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(ok, r, n)].set(jnp.arange(k), mode='drop')

    det_ids = jnp.where(react_slot_of_det >= 0,
                        state.ids[react_slot_of_det], -1)
    is_new = det_valid & (det_ids < 0)
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    det_ids = jnp.where(is_new, state.num_tracks + new_rank, det_ids)
    det_ids = jnp.where(det_valid, det_ids, -1)
    num_tracks = state.num_tracks + is_new.sum()

    # ---- state update ---------------------------------------------------
    # propagated slots update in place
    ring = jnp.mod(state.embed_cnt.astype(jnp.int32), cfg.num_samples)
    embeds = jnp.where(
        prop[:, None, None],
        state.embeds.at[jnp.arange(k), ring].set(prop_embeds),
        state.embeds)
    embed_cnt = jnp.where(prop, jnp.minimum(
        state.embed_cnt + 1, cfg.num_samples), state.embed_cnt)
    bbox = jnp.where(prop[:, None], reg_boxes, state.bbox)
    last_frame = jnp.where(prop, frame_id, state.last_frame)

    st = TracktorState(bbox, state.label, state.ids, embeds, embed_cnt,
                       last_frame, state.valid, num_tracks)

    # detections (re-activated or new) insert/update via fori_loop
    def body(i, s):
        keep = det_valid[i] & (det_ids[i] >= 0)
        same = (s.ids == det_ids[i]) & s.valid
        exists = same.any()
        slot_same = jnp.argmax(same)
        free = ~s.valid
        stale = jnp.argmin(jnp.where(s.valid, s.last_frame, -(10 ** 9)))
        slot = jnp.where(exists, slot_same,
                         jnp.where(free.any(), jnp.argmax(free), stale))
        ring_i = jnp.mod(s.embed_cnt[slot].astype(jnp.int32),
                         cfg.num_samples)
        emb = jnp.where(
            exists,
            s.embeds[slot].at[ring_i].set(det_embeds[i]),
            jnp.zeros_like(s.embeds[slot]).at[0].set(det_embeds[i]))

        def w(a, v):
            return a.at[slot].set(jnp.where(keep, v, a[slot]))

        return TracktorState(
            w(s.bbox, det_bboxes[i]), w(s.label, det_labels[i]),
            w(s.ids, det_ids[i]), w(s.embeds, emb),
            w(s.embed_cnt, jnp.where(
                exists, jnp.minimum(s.embed_cnt[slot] + 1,
                                    cfg.num_samples), 1.0)),
            w(s.last_frame, frame_id), w(s.valid, True), s.num_tracks)

    st = jax.lax.fori_loop(0, n, body, st)
    valid = st.valid & (frame_id - st.last_frame < cfg.num_frames_retain)
    st = st._replace(valid=valid)

    out_boxes = jnp.concatenate([reg_boxes, det_bboxes], 0)
    out_scores = jnp.concatenate([reg_scores, det_scores], 0)
    out_labels = jnp.concatenate([state.label, det_labels], 0)
    out_ids = jnp.concatenate([jnp.where(prop, state.ids, -1), det_ids], 0)
    out_valid = jnp.concatenate([prop, det_valid], 0)
    return st, (out_boxes, out_scores, out_labels, out_ids, out_valid)


def make_regress_fn(det_module, variables, cfg_det,
                    img_shape: Tuple[int, int]) -> Callable:
    """Build the RoI-head regression closure for the single-level
    two-stage core: boxes (K, 4) -> (regressed boxes (K, 4), scores (K,)).
    Background-excluded class-0 decode (the MOT detector is single-class,
    mmdet predict_bbox semantics)."""
    from .two_stage import FasterRCNN, delta2bbox

    def regress(feat, boxes):
        rf = det_module.apply(variables, feat, boxes,
                              method=FasterRCNN.roi_feats)
        cls, reg, _ = det_module.apply(variables, rf,
                                       method=FasterRCNN.roi_forward)
        probs = jax.nn.softmax(cls, axis=-1)
        scores = probs[:, 0]
        deltas = reg.reshape(reg.shape[0], -1, 4)[:, 0]
        out = delta2bbox(boxes, deltas, cfg_det.target_stds, img_shape)
        return out, scores

    return jax.jit(regress)


class TracktorStreaming:
    """Per-frame streaming Tracktor: the reference model composition
    (Faster R-CNN detector + ReID + tracktor_tracker) — detect, regress
    the previous frame's track boxes with the RoI head, embed crops,
    associate with ``tracktor_step``."""

    def __init__(self, det_variables, reid_variables, det_cfg,
                 cfg: TracktorConfig = TracktorConfig(),
                 input_shape: Tuple[int, int] = (384, 512),
                 reid_hw: Tuple[int, int] = (256, 128),
                 num_dets: int = 32, dtype=jnp.float32, cmc=None):
        from .reid import BaseReID
        from .strongsort import crop_resize_boxes
        from .two_stage import (FasterRCNN, rcnn_predict, rpn_proposals,
                                standard_anchors)

        self.cfg = cfg
        self.det_cfg = det_cfg
        # ECC camera-motion compensation applied to the previous frame's
        # track boxes before RoI regression (reference tracktor.py:49-64 +
        # tracktor_tracker.py:179-185 with_cmc path)
        self.cmc = cmc
        self._last_img = None
        self.module = FasterRCNN(det_cfg, dtype=dtype)
        self.det_variables = det_variables
        self.reid = BaseReID(embed_dim=cfg.embed_dim, num_classes=1)
        self.reid_variables = reid_variables
        self.input_shape = input_shape
        self.state = init_state(cfg)
        n = num_dets

        def detect(variables, img):
            feat = self.module.apply(variables, img,
                                     method=FasterRCNN.extract_feat)
            cls, reg = self.module.apply(variables, feat,
                                         method=FasterRCNN.rpn)
            anchors = jnp.asarray(standard_anchors(
                feat.shape[1], feat.shape[2], det_cfg.stride,
                det_cfg.anchor_scales, det_cfg.anchor_ratios))
            rois, _, valid = rpn_proposals(cls[0], reg[0], anchors,
                                           input_shape, det_cfg)
            rf = self.module.apply(variables, feat[0], rois,
                                   method=FasterRCNN.roi_feats)
            ccls, creg, _ = self.module.apply(variables, rf,
                                              method=FasterRCNN.roi_forward)
            res = rcnn_predict(ccls, creg, rois, valid, input_shape,
                               det_cfg)
            return feat, (res.boxes[:n], res.scores[:n], res.labels[:n],
                          res.valid[:n])

        self._detect = jax.jit(detect)
        self._regress = make_regress_fn(self.module, det_variables,
                                        det_cfg, input_shape)

        def embed(reid_vars, img, boxes):
            crops = crop_resize_boxes(img, boxes, reid_hw)
            emb, _ = self.reid.apply(reid_vars, crops, train=False)
            return emb

        self._embed = jax.jit(embed)

    def reset(self):
        self.state = init_state(self.cfg)

    def track(self, img, frame_id: int):
        """img (1, H, W, 3) float. Returns dict over the K+N output rows
        (propagated tracks then detections) with ids and validity."""
        import numpy as np

        img = jnp.asarray(img, jnp.float32)
        if frame_id == 0:
            self.reset()
            self._last_img = None
        if self.cmc is not None and self._last_img is not None \
                and bool(jnp.any(self.state.valid)):
            curr_u8 = np.clip(np.asarray(img[0]), 0, 255).astype(np.uint8)
            try:
                warped, _ = self.cmc.compensate(self._last_img, curr_u8,
                                                self.state.bbox)
            except Exception:
                # ECC non-convergence (cv2.error): skip compensation for
                # this frame, as an unconverged warp is worse than none
                warped = None
            if warped is not None:
                h, w = img.shape[1:3]
                warped = jnp.clip(warped, 0.0,
                                  jnp.asarray([w, h, w, h], jnp.float32))
                self.state = self.state._replace(
                    bbox=jnp.where(self.state.valid[:, None], warped,
                                   self.state.bbox))
        if self.cmc is not None:
            self._last_img = np.clip(np.asarray(img[0]), 0,
                                     255).astype(np.uint8)
        feat, (db, ds, dl, dv) = self._detect(self.det_variables, img)
        reg_boxes, reg_scores = self._regress(feat[0], self.state.bbox)
        det_embeds = self._embed(self.reid_variables, img[0], db)
        prop_embeds = self._embed(self.reid_variables, img[0], reg_boxes)
        self.state, (ob, os_, ol, oid, ov) = tracktor_step(
            self.state, reg_boxes, reg_scores, db, ds, dl, det_embeds,
            dv, prop_embeds, jnp.int32(frame_id), self.cfg)
        return dict(bboxes=ob, scores=os_, labels=ol, instances_id=oid,
                    valid=ov)
