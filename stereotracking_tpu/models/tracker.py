"""OC-SORT tracker with depth/scale plumbing, as a pure fixed-shape function.

This is the TPU-native redesign of the reference's per-track Python loop
(``/root/reference/mmtrack/models/trackers/ocsort_tracker_disparity.py:345-618``
plus the slot bookkeeping in ``base_tracker.py`` / ``kalman_tracker_base.py``):
instead of a dict of per-track numpy states mutated on the host, the tracker
is a ``TrackState`` pytree of K fixed slots advanced by a pure
``step(state, dets, frame_id) -> (state, output)`` function.  Every
data-dependent branch of the reference (confirmed/tentative splits, OCR on
leftovers, online smoothing over variable lost-lengths, evictions) becomes a
masked dense computation, so the whole per-frame update jit-compiles into the
same program as the detector and runs under ``lax.scan`` over frames.

Algorithmic order is kept exactly:

1. gate detections (score > obj_score_thr, area > 100);
2. Kalman predict on confirmed tracks (vh zeroed for lost tracks,
   pre-predict state saved for tracked ones);
3. OCM association (IoU + velocity-direction consistency, JV assignment with
   ``cost_limit = 1 - match_iou_thr``) against confirmed tracks;
4. second OCM pass of leftover detections against tentative tracks;
5. OCR (last-observation IoU) for still-unmatched tracks;
6. online smoothing: recovered tracks replay KF updates over a linearly
   interpolated virtual trajectory from their saved state;
7. KF update + velocity/observation bookkeeping for matches, new IDs for
   leftover detections, retention/tentative eviction.

The observation history a track needs (k-step-ago box for OCM velocity) is a
ring buffer of ``vel_delta_t + 1`` entries per slot; the last associated box
and the pre-loss Kalman state are dedicated fields.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.assignment import linear_assignment_with_limit
from ..ops.gmc import apply_warp_to_tracks
from ..structures.bbox import (bbox_area, bbox_cxcyah_to_xyxy,
                               bbox_iou_matrix, bbox_xyxy_to_cxcyah)
from . import kalman


class TrackerConfig(NamedTuple):
    """Hyperparameters (reference config values:
    configs/stereo_tracking/ocsort/yolox_s_mmyolo_mot_airdrone_disp.py:49-58).
    """
    num_slots: int = 64          # K fixed track slots
    num_dets: int = 64           # detection slots entering association
    obj_score_thr: float = 0.3
    init_track_thr: float = 0.7
    weight_iou_with_det_scores: bool = False
    match_iou_thr: float = 0.1
    num_tentatives: int = 3
    vel_consist_weight: float = 0.2
    vel_delta_t: int = 3
    num_frames_retain: int = 30
    min_det_area: float = 100.0

    @property
    def ring_size(self) -> int:
        return self.vel_delta_t + 1


class TrackState(NamedTuple):
    """Fixed-slot track memory (all arrays have leading dim K)."""
    active: jnp.ndarray       # (K,) bool
    tentative: jnp.ndarray    # (K,) bool
    tracked: jnp.ndarray      # (K,) bool — matched at the last frame seen
    ids: jnp.ndarray          # (K,) int32 global track id
    labels: jnp.ndarray       # (K,) int32
    mean: jnp.ndarray         # (K, 8) Kalman mean (cxcyah + velocities)
    cov: jnp.ndarray          # (K, 8, 8)
    saved_mean: jnp.ndarray   # (K, 8) pre-loss Kalman state
    saved_cov: jnp.ndarray    # (K, 8, 8)
    last_bbox: jnp.ndarray    # (K, 4) last associated detection (xyxy)
    scores: jnp.ndarray       # (K,)
    scales: jnp.ndarray       # (K,)
    depths: jnp.ndarray       # (K,)
    velocity: jnp.ndarray     # (K, 2) normalized (dy, dx); (-1,-1) placeholder
    last_frame: jnp.ndarray   # (K,) int32 frame of last match
    hits: jnp.ndarray         # (K,) int32 number of matched frames
    miss_count: jnp.ndarray   # (K,) int32 consecutive missed observations
    obs_count: jnp.ndarray    # (K,) int32 total per-frame history entries
    obs_ring: jnp.ndarray     # (K, R, 4) per-frame observation ring
    obs_ring_valid: jnp.ndarray  # (K, R) bool
    num_tracks: jnp.ndarray   # () int32 global id counter


class Detections(NamedTuple):
    """Fixed-slot detections entering the tracker (leading dim Nd)."""
    bboxes: jnp.ndarray   # (Nd, 4) xyxy — in scaled (inflated) space
    scores: jnp.ndarray   # (Nd,)
    labels: jnp.ndarray   # (Nd,) int32
    scales: jnp.ndarray   # (Nd,)
    depths: jnp.ndarray   # (Nd,)
    valid: jnp.ndarray    # (Nd,) bool


class TrackerOutput(NamedTuple):
    """Per-frame tracked instances (fixed Nd slots, det order)."""
    bboxes: jnp.ndarray   # (Nd, 4) — still in scaled space
    scores: jnp.ndarray
    labels: jnp.ndarray
    scales: jnp.ndarray
    depths: jnp.ndarray
    ids: jnp.ndarray      # (Nd,) int32 track ids (-1 invalid)
    valid: jnp.ndarray    # (Nd,) bool


def init_state(cfg: TrackerConfig) -> TrackState:
    K, R = cfg.num_slots, cfg.ring_size
    f32, i32 = jnp.float32, jnp.int32
    return TrackState(
        active=jnp.zeros((K,), bool),
        tentative=jnp.zeros((K,), bool),
        tracked=jnp.zeros((K,), bool),
        ids=jnp.full((K,), -1, i32),
        labels=jnp.zeros((K,), i32),
        mean=jnp.zeros((K, 8), f32),
        cov=jnp.zeros((K, 8, 8), f32),
        saved_mean=jnp.zeros((K, 8), f32),
        saved_cov=jnp.zeros((K, 8, 8), f32),
        last_bbox=jnp.zeros((K, 4), f32),
        scores=jnp.zeros((K,), f32),
        scales=jnp.ones((K,), f32),
        depths=jnp.full((K,), -1.0, f32),
        velocity=jnp.full((K, 2), -1.0, f32),
        last_frame=jnp.full((K,), -1, i32),
        hits=jnp.zeros((K,), i32),
        miss_count=jnp.zeros((K,), i32),
        obs_count=jnp.zeros((K,), i32),
        obs_ring=jnp.zeros((K, R, 4), f32),
        obs_ring_valid=jnp.zeros((K, R), bool),
        num_tracks=jnp.int32(0),
    )


def _k_step_observation(state: TrackState, cfg: TrackerConfig,
                        obs_count: jnp.ndarray) -> jnp.ndarray:
    """Per-slot observation ``vel_delta_t`` steps back, falling back to the
    last associated box (reference ``k_step_observation``,
    ocsort_tracker_disparity.py:173-185)."""
    R = cfg.ring_size
    idx = obs_count - 1 - cfg.vel_delta_t          # (K,)
    ring_pos = jnp.mod(idx, R)
    k_obs = jnp.take_along_axis(
        state.obs_ring, ring_pos[:, None, None].repeat(4, -1), axis=1)[:, 0]
    k_valid = jnp.take_along_axis(
        state.obs_ring_valid, ring_pos[:, None], axis=1)[:, 0]
    use_ring = (obs_count > cfg.vel_delta_t) & k_valid
    return jnp.where(use_ring[:, None], k_obs, state.last_bbox)


def _vel_direction_batch(boxes_from: jnp.ndarray,
                         boxes_to: jnp.ndarray) -> jnp.ndarray:
    """Normalized (dy, dx) directions from each ``boxes_from`` center to each
    ``boxes_to`` center -> (K, Nd, 2). Reference vel_direction_batch
    (ocsort_tracker_disparity.py:158-171)."""
    c_from = (boxes_from[:, :2] + boxes_from[:, 2:]) / 2.0    # (K, 2) xy
    c_to = (boxes_to[:, :2] + boxes_to[:, 2:]) / 2.0          # (Nd, 2) xy
    dy = c_to[None, :, 1] - c_from[:, None, 1]
    dx = c_to[None, :, 0] - c_from[:, None, 0]
    speed = jnp.stack([dy, dx], axis=-1)
    norm = jnp.sqrt(speed[..., 0] ** 2 + speed[..., 1] ** 2) + 1e-6
    return speed / norm[..., None]


def _vel_direction(box_from: jnp.ndarray, box_to: jnp.ndarray) -> jnp.ndarray:
    """Aligned version: (K, 4) x (K, 4) -> (K, 2) normalized (dy, dx);
    placeholder (-1, -1) when either box has negative coordinate sum
    (reference vel_direction, ocsort_tracker_disparity.py:148-156)."""
    c1 = (box_from[:, :2] + box_from[:, 2:]) / 2.0
    c2 = (box_to[:, :2] + box_to[:, 2:]) / 2.0
    speed = jnp.stack([c2[:, 1] - c1[:, 1], c2[:, 0] - c1[:, 0]], axis=-1)
    norm = jnp.sqrt(speed[:, 0] ** 2 + speed[:, 1] ** 2) + 1e-6
    direction = speed / norm[:, None]
    invalid = (jnp.sum(box_from, -1) < 0) | (jnp.sum(box_to, -1) < 0)
    return jnp.where(invalid[:, None], -1.0, direction)


def _ocm_cost(track_boxes: jnp.ndarray, state: TrackState, dets: Detections,
              cfg: TrackerConfig) -> jnp.ndarray:
    """OCM cost = (1 - IoU) [+ velocity-direction-consistency term].

    Reference ocm_assign_ids (ocsort_tracker_disparity.py:187-265)."""
    ious = bbox_iou_matrix(track_boxes, dets.bboxes)
    if cfg.weight_iou_with_det_scores:
        ious = ious * dets.scores[None, :]
    cost = 1.0 - ious

    k_obs = _k_step_observation(state, cfg, state.obs_count)       # (K, 4)
    valid1 = jnp.sum(state.velocity, -1) != -2.0
    valid2 = jnp.sum(k_obs, -1) != -4.0
    valid = valid1 & valid2

    vel_to_match = _vel_direction_batch(k_obs, dets.bboxes)        # (K,Nd,2)
    angle_cos = jnp.clip(
        jnp.sum(vel_to_match * state.velocity[:, None, :], -1), -1.0, 1.0)
    angle = jnp.arccos(angle_cos)
    norm_angle = (angle - math.pi / 2.0) / math.pi
    cost = cost + jnp.where(valid[:, None], norm_angle, 0.0) * \
        cfg.vel_consist_weight
    return cost


def _assign(cost: jnp.ndarray, row_mask: jnp.ndarray, col_mask: jnp.ndarray,
            cfg: TrackerConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return linear_assignment_with_limit(
        cost, row_mask, col_mask, 1.0 - cfg.match_iou_thr)


def step(state: TrackState, dets: Detections, frame_id: jnp.ndarray,
         cfg: TrackerConfig, warp: jnp.ndarray | None = None
         ) -> Tuple[TrackState, TrackerOutput]:
    """Advance the tracker one frame. Pure function; jit/scan-safe.

    ``warp``: optional (2, 3) camera-motion affine applied to confirmed
    tracks' Kalman states right after prediction (reference track() lines
    443-445; identity disables).
    """
    frame_id = jnp.asarray(frame_id, jnp.int32)
    state = jax.lax.cond(
        frame_id == 0, lambda s: init_state(cfg), lambda s: s, state)

    empty = jnp.logical_not(jnp.any(state.active))
    no_dets = jnp.logical_not(jnp.any(dets.valid))
    return jax.lax.cond(
        empty | no_dets,
        lambda: _init_path(state, dets, frame_id, cfg),
        lambda: _main_path(state, dets, frame_id, cfg, warp))


# --------------------------------------------------------------------------
# init path: tracker empty or no detections at all
# (reference track() lines 391-403: score > init_track_thr seeds new tracks;
# existing tracks are left untouched except for retention eviction)
# --------------------------------------------------------------------------

def _init_path(state: TrackState, dets: Detections, frame_id: jnp.ndarray,
               cfg: TrackerConfig) -> Tuple[TrackState, TrackerOutput]:
    is_new = dets.valid & (dets.scores > cfg.init_track_thr)
    new_ids = state.num_tracks + jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_ids = jnp.where(is_new, new_ids, -1)

    state = _spawn_tracks(state, dets, is_new, new_ids, frame_id, cfg)
    state = _evict(state, frame_id, cfg)
    state = state._replace(
        num_tracks=state.num_tracks + jnp.sum(is_new, dtype=jnp.int32))

    out = TrackerOutput(
        bboxes=dets.bboxes, scores=dets.scores, labels=dets.labels,
        scales=dets.scales, depths=dets.depths,
        ids=new_ids.astype(jnp.int32), valid=is_new)
    return state, out


# --------------------------------------------------------------------------
# main path
# --------------------------------------------------------------------------

def _main_path(state: TrackState, dets: Detections, frame_id: jnp.ndarray,
               cfg: TrackerConfig, warp: jnp.ndarray | None = None
               ) -> Tuple[TrackState, TrackerOutput]:
    K, Nd = cfg.num_slots, dets.bboxes.shape[0]

    # 0. gate detections (track() lines 412-421)
    gate = dets.valid & (dets.scores > cfg.obj_score_thr) & \
        (bbox_area(dets.bboxes) > cfg.min_det_area)

    # 1. Kalman predict on confirmed tracks (lines 431-441)
    confirmed = state.active & jnp.logical_not(state.tentative)
    lost = state.last_frame != frame_id - 1
    mean = state.mean.at[:, 7].set(
        jnp.where(confirmed & lost, 0.0, state.mean[:, 7]))
    save = confirmed & state.tracked
    saved_mean = jnp.where(save[:, None], mean, state.saved_mean)
    saved_cov = jnp.where(save[:, None, None], state.cov, state.saved_cov)
    pmean, pcov = kalman.predict(mean, state.cov)
    mean = jnp.where(confirmed[:, None], pmean, mean)
    cov = jnp.where(confirmed[:, None, None], pcov, state.cov)
    if warp is not None:
        # camera-motion compensation on the persistent Kalman states
        mean, cov = apply_warp_to_tracks(mean, cov, warp, confirmed)
    state = state._replace(mean=mean, cov=cov, saved_mean=saved_mean,
                           saved_cov=saved_cov)

    track_boxes = bbox_cxcyah_to_xyxy(mean[:, :4])

    # 2. OCM pass on confirmed tracks (lines 448-472)
    cost = _ocm_cost(track_boxes, state, dets, cfg)
    row1, col1 = _assign(cost, confirmed, gate, cfg)
    det_matched1 = col1 >= 0

    # 3. OCM pass on tentative tracks with leftover dets (lines 474-504)
    tentative = state.active & state.tentative
    row2, col2 = _assign(cost, tentative, gate & ~det_matched1, cfg)
    det_matched2 = col2 >= 0

    # 4. OCR on all still-unmatched tracks vs leftover dets (lines 506-569)
    track_matched12 = (row1 >= 0) | (row2 >= 0)
    ocr_rows = state.active & jnp.logical_not(track_matched12)
    ocr_ious = bbox_iou_matrix(state.last_bbox, dets.bboxes)
    if cfg.weight_iou_with_det_scores:
        ocr_ious = ocr_ious * dets.scores[None, :]
    row3, col3 = _assign(1.0 - ocr_ious, ocr_rows,
                         gate & ~det_matched1 & ~det_matched2, cfg)

    det_slot = jnp.where(det_matched1, col1,
                         jnp.where(det_matched2, col2, col3))      # (Nd,)
    det_matched = det_slot >= 0
    slot_det = jnp.where(row1 >= 0, row1,
                         jnp.where(row2 >= 0, row2, row3))          # (K,)
    slot_matched = slot_det >= 0

    # 5. unmatched tracks: mark lost, append empty observation (lines 579-582)
    # 6. online smoothing for recovered tracks (lines 572-577, 319-343)
    safe_det = jnp.clip(slot_det, 0, Nd - 1)
    match_bbox = dets.bboxes[safe_det]                              # (K, 4)
    recovered = slot_matched & jnp.logical_not(state.tracked)
    unmatch_len = jnp.where(recovered, state.miss_count, 0)
    shift = (match_bbox - state.last_bbox) / \
        (unmatch_len[:, None].astype(jnp.float32) + 1.0)

    smooth_mean = jnp.where(recovered[:, None], state.saved_mean, state.mean)
    smooth_cov = jnp.where(recovered[:, None, None], state.saved_cov,
                           state.cov)

    # replay only as many virtual steps as the longest recovery needs —
    # on typical frames nothing was recovered and the loop body never runs
    max_replay = jnp.max(jnp.where(recovered, unmatch_len, 0))

    def smooth_cond(st):
        i, _, _ = st
        return i < max_replay

    def smooth_body(st):
        i, m, c = st
        virtual = state.last_bbox + (i + 1).astype(jnp.float32) * shift
        m2, c2 = kalman.update(m, c, bbox_xyxy_to_cxcyah(virtual))
        apply = recovered & (i < unmatch_len)
        return (i + 1, jnp.where(apply[:, None], m2, m),
                jnp.where(apply[:, None, None], c2, c))

    _, mean, cov = jax.lax.while_loop(
        smooth_cond, smooth_body, (jnp.int32(0), smooth_mean, smooth_cov))

    # 7. KF update + bookkeeping for matched tracks
    #    (kalman_tracker_base.py:65-75 + ocsort update_track lines 128-146)
    meas = bbox_xyxy_to_cxcyah(match_bbox)
    umean, ucov = kalman.update(mean, cov, meas)
    mean = jnp.where(slot_matched[:, None], umean, mean)
    cov = jnp.where(slot_matched[:, None, None], ucov, cov)

    new_hits = jnp.where(slot_matched, state.hits + 1, state.hits)
    now_confirmed = state.tentative & slot_matched & \
        (new_hits >= cfg.num_tentatives)
    new_tentative = jnp.where(now_confirmed, False, state.tentative)

    # per-frame observation append for every active track (valid iff matched)
    R = cfg.ring_size
    ring_pos = jnp.mod(state.obs_count, R)
    obs_ring = _ring_set(state.obs_ring, ring_pos, match_bbox,
                         state.active)
    obs_ring_valid = _ring_set_flag(
        state.obs_ring_valid, ring_pos,
        slot_matched, state.active)
    obs_count = jnp.where(state.active, state.obs_count + 1,
                          state.obs_count)

    # velocity from k-step-back observation to the new box (post-append)
    tmp_state = state._replace(
        obs_ring=obs_ring, obs_ring_valid=obs_ring_valid,
        last_bbox=jnp.where(slot_matched[:, None], match_bbox,
                            state.last_bbox))
    k_obs_new = _k_step_observation(tmp_state, cfg, obs_count)
    vel = _vel_direction(k_obs_new, match_bbox)
    velocity = jnp.where(slot_matched[:, None], vel, state.velocity)

    state = state._replace(
        mean=mean, cov=cov, hits=new_hits, tentative=new_tentative,
        tracked=jnp.where(state.active, slot_matched, state.tracked),
        obs_ring=obs_ring, obs_ring_valid=obs_ring_valid,
        obs_count=obs_count, velocity=velocity,
        miss_count=jnp.where(
            slot_matched, 0,
            jnp.where(state.active, state.miss_count + 1,
                      state.miss_count)),
        last_bbox=tmp_state.last_bbox,
        last_frame=jnp.where(slot_matched, frame_id, state.last_frame),
        scores=jnp.where(slot_matched, dets.scores[safe_det], state.scores),
        scales=jnp.where(slot_matched, dets.scales[safe_det], state.scales),
        depths=jnp.where(slot_matched, dets.depths[safe_det], state.depths),
        labels=jnp.where(slot_matched, dets.labels[safe_det], state.labels))

    # 8. new tracks for unmatched gated dets (lines 591-596)
    is_new = gate & jnp.logical_not(det_matched)
    new_ids = state.num_tracks + jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_ids = jnp.where(is_new, new_ids, -1)
    state = _spawn_tracks(state, dets, is_new, new_ids, frame_id, cfg)

    # 9. eviction + id counter
    state = _evict(state, frame_id, cfg)
    state = state._replace(
        num_tracks=state.num_tracks + jnp.sum(is_new, dtype=jnp.int32))

    # output: every gated det with its (track or fresh) id, det order
    safe_slot = jnp.clip(det_slot, 0, K - 1)
    out_ids = jnp.where(det_matched, state.ids[safe_slot], new_ids)
    out = TrackerOutput(
        bboxes=dets.bboxes, scores=dets.scores, labels=dets.labels,
        scales=dets.scales, depths=dets.depths,
        ids=out_ids.astype(jnp.int32), valid=gate)
    return state, out


def _ring_set(ring: jnp.ndarray, pos: jnp.ndarray, boxes: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    """ring (K,R,4); write boxes at per-slot position where mask."""
    K, R, _ = ring.shape
    onehot = jax.nn.one_hot(pos, R, dtype=bool) & mask[:, None]     # (K,R)
    return jnp.where(onehot[..., None], boxes[:, None, :], ring)


def _ring_set_flag(ring: jnp.ndarray, pos: jnp.ndarray, value: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    K, R = ring.shape
    onehot = jax.nn.one_hot(pos, R, dtype=bool) & mask[:, None]
    return jnp.where(onehot, value[:, None], ring)


def _spawn_tracks(state: TrackState, dets: Detections, is_new: jnp.ndarray,
                  new_ids: jnp.ndarray, frame_id: jnp.ndarray,
                  cfg: TrackerConfig) -> TrackState:
    """Initialise tracks for flagged detections in free slots
    (reference init_track, ocsort_tracker_disparity.py:105-126)."""
    K, R = cfg.num_slots, cfg.ring_size
    Nd = dets.bboxes.shape[0]

    free = jnp.logical_not(state.active)                       # (K,)
    # order free slots first (stable) -> position r holds the r-th free slot
    free_order = jnp.argsort(jnp.logical_not(free), stable=True)
    num_free = jnp.sum(free, dtype=jnp.int32)
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1        # (Nd,)
    fits = is_new & (new_rank < num_free)
    slot_for_det = jnp.where(
        fits, free_order[jnp.clip(new_rank, 0, K - 1)], K)     # K = drop

    # scatter det properties into slots
    def scat(target, values):
        # target (K, ...), values (Nd, ...)
        return target.at[slot_for_det].set(values, mode='drop')

    meas = bbox_xyxy_to_cxcyah(dets.bboxes)
    imean, icov = kalman.initiate(meas)                        # (Nd, 8[,8])

    st = state
    st = st._replace(
        active=st.active.at[slot_for_det].set(True, mode='drop'),
        tentative=st.tentative.at[slot_for_det].set(
            frame_id != 0, mode='drop'),
        tracked=st.tracked.at[slot_for_det].set(True, mode='drop'),
        ids=st.ids.at[slot_for_det].set(new_ids, mode='drop'),
        labels=st.labels.at[slot_for_det].set(dets.labels, mode='drop'),
        mean=scat(st.mean, imean),
        cov=scat(st.cov, icov),
        saved_mean=scat(st.saved_mean, imean),
        saved_cov=scat(st.saved_cov, icov),
        last_bbox=scat(st.last_bbox, dets.bboxes),
        scores=st.scores.at[slot_for_det].set(dets.scores, mode='drop'),
        scales=st.scales.at[slot_for_det].set(dets.scales, mode='drop'),
        depths=st.depths.at[slot_for_det].set(dets.depths, mode='drop'),
        velocity=scat(st.velocity, jnp.full((Nd, 2), -1.0, jnp.float32)),
        last_frame=st.last_frame.at[slot_for_det].set(
            frame_id, mode='drop'),
        hits=st.hits.at[slot_for_det].set(1, mode='drop'),
        miss_count=st.miss_count.at[slot_for_det].set(0, mode='drop'),
        obs_count=st.obs_count.at[slot_for_det].set(1, mode='drop'),
        obs_ring=scat(st.obs_ring,
                      jnp.zeros((Nd, R, 4)).at[:, 0].set(dets.bboxes)),
        obs_ring_valid=scat(st.obs_ring_valid,
                            jnp.zeros((Nd, R), bool).at[:, 0].set(True)),
    )
    return st


def _evict(state: TrackState, frame_id: jnp.ndarray,
           cfg: TrackerConfig) -> TrackState:
    """Retention + unconfirmed eviction (kalman_tracker_base.py:77-88)."""
    case1 = (frame_id - state.last_frame) >= cfg.num_frames_retain
    case2 = state.tentative & (state.last_frame != frame_id)
    return state._replace(
        active=state.active & jnp.logical_not(case1 | case2))
