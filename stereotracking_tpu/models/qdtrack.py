"""QDTrack: quasi-dense embedding head, bisoftmax tracker, and the
multi-positive contrastive training losses — fixed-slot TPU-native.

Re-creates:

* head     /root/reference/mmtrack/models/track_heads/
  quasi_dense_embed_head.py (4 convs + 1 fc -> 256-d embedding; multi-pos
  cross-entropy track loss + L2 auxiliary loss)
* tracker  /root/reference/mmtrack/models/trackers/quasi_dense_tracker.py
  (score-ordered intra-frame dedup with backdrop/class IoU thresholds,
  bisoftmax matching against the track+backdrop memory, greedy
  column-claiming assignment, momentum embeds, velocity accumulation,
  backdrop ring)

The reference's python dict memory becomes two fixed arrays (track slots
+ one backdrop buffer); the order-dependent greedy loops are exact
``lax.fori_loop`` transcriptions.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_NEG = -1e9


class QuasiDenseEmbedHead(nn.Module):
    """RoI feature -> track embedding (quasi_dense_embed_head.py: 4 convs
    of 256 + single fc, linear output)."""
    conv_channels: int = 256
    num_convs: int = 4
    fc_dim: int = 1024
    embed_channels: int = 256
    use_gn: bool = False
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_channels, (3, 3), padding=1,
                        use_bias=not self.use_gn, dtype=self.dtype,
                        name=f'conv{i}')(x)
            if self.use_gn:
                # reference ConvModule norm_cfg=GN(32)
                # (quasi-dense configs; ConvModule bias='auto' -> False)
                x = nn.GroupNorm(num_groups=self.gn_groups,
                                 dtype=self.dtype, name=f'gn{i}')(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name='fc')(x))
        return nn.Dense(self.embed_channels, dtype=self.dtype,
                        name='embed')(x)


class QDTrackConfig(NamedTuple):
    num_slots: int = 128
    num_backdrops: int = 64
    init_score_thr: float = 0.8
    obj_score_thr: float = 0.5
    match_score_thr: float = 0.5
    memo_tracklet_frames: int = 10
    memo_momentum: float = 0.8
    nms_conf_thr: float = 0.5
    nms_backdrop_iou_thr: float = 0.3
    nms_class_iou_thr: float = 0.7
    with_cats: bool = True
    embed_dim: int = 256


class QDTrackState(NamedTuple):
    bbox: jnp.ndarray          # (K, 4)
    embed: jnp.ndarray         # (K, E)
    label: jnp.ndarray         # (K,)
    score: jnp.ndarray         # (K,)
    ids: jnp.ndarray           # (K,)
    velocity: jnp.ndarray      # (K, 4)
    acc_frame: jnp.ndarray     # (K,)
    last_frame: jnp.ndarray    # (K,)
    valid: jnp.ndarray         # (K,)
    bd_bbox: jnp.ndarray       # (B, 4) backdrops (previous frame)
    bd_embed: jnp.ndarray      # (B, E)
    bd_label: jnp.ndarray      # (B,)
    bd_valid: jnp.ndarray      # (B,)
    num_tracks: jnp.ndarray    # ()


def init_state(cfg: QDTrackConfig) -> QDTrackState:
    k, b, e = cfg.num_slots, cfg.num_backdrops, cfg.embed_dim
    return QDTrackState(
        jnp.zeros((k, 4)), jnp.zeros((k, e)), jnp.zeros((k,), jnp.int32),
        jnp.zeros((k,)), jnp.full((k,), -1, jnp.int32), jnp.zeros((k, 4)),
        jnp.zeros((k,)), jnp.full((k,), -(10 ** 6), jnp.int32),
        jnp.zeros((k,), bool),
        jnp.zeros((b, 4)), jnp.zeros((b, e)), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), bool), jnp.zeros((), jnp.int32))


def _iou(b1, b2):
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = jnp.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / jnp.maximum(a1[:, None] + a2[None] - inter, 1e-10)


@partial(jax.jit, static_argnames=('cfg',))
def qdtrack_step(state: QDTrackState, bboxes, scores, labels, embeds,
                 det_valid, frame_id, cfg: QDTrackConfig):
    """One association step over score-DESCENDING-sorted detections
    (sorting happens inside). Returns (new_state, ids aligned to the
    INPUT detection order; -1 dropped, -2 suppressed-by-confidence)."""
    n = bboxes.shape[0]
    order = jnp.argsort(jnp.where(det_valid, -scores, 1e9))
    bboxes = bboxes[order]
    scores = scores[order]
    labels = labels[order]
    embeds = embeds[order]
    det_valid = det_valid[order]

    # intra-frame dedup (tracker :243-255): det i dies if it overlaps a
    # surviving earlier det beyond its score-dependent threshold
    ious_dd = _iou(bboxes, bboxes)
    thr_i = jnp.where(scores < cfg.obj_score_thr,
                      cfg.nms_backdrop_iou_thr, cfg.nms_class_iou_thr)

    def dedup_body(i, keep):
        earlier = (jnp.arange(n) < i) & keep
        clash = ((ious_dd[i] > thr_i[i]) & earlier).any()
        return keep.at[i].set(keep[i] & ~clash)

    keep = jax.lax.fori_loop(0, n, dedup_body, det_valid)

    # memory = tracks ++ backdrops (memo property :154-188)
    m_embed = jnp.concatenate([state.embed, state.bd_embed], 0)
    m_label = jnp.concatenate([state.label, state.bd_label], 0)
    m_ids = jnp.concatenate([state.ids,
                             jnp.full((cfg.num_backdrops,), -1,
                                      jnp.int32)], 0)
    m_valid = jnp.concatenate([state.valid, state.bd_valid], 0)

    feats = embeds @ m_embed.T                          # (N, M)
    feats = jnp.where(keep[:, None] & m_valid[None, :], feats, _NEG)
    d2t = jax.nn.softmax(feats, axis=1)
    t2d = jax.nn.softmax(feats, axis=0)
    match = (d2t + t2d) / 2.0                           # bisoftmax
    if cfg.with_cats:
        match = match * (labels[:, None] == m_label[None, :])
    match = jnp.where(keep[:, None] & m_valid[None, :], match, 0.0)

    # greedy assignment in score order, claiming memo columns (:283-302)
    def assign_body(i, carry):
        ids, mt, num = carry
        conf = mt[i].max()
        ind = mt[i].argmax()
        mid = m_ids[ind]
        good = keep[i] & (conf > cfg.match_score_thr)
        take = good & (mid > -1) & (scores[i] > cfg.obj_score_thr)
        suppress = good & (mid > -1) & (scores[i] <= cfg.obj_score_thr) \
            & (conf > cfg.nms_conf_thr)
        ids = ids.at[i].set(jnp.where(take, mid,
                                      jnp.where(suppress, -2, -1)))
        # zero the claimed column for all other detections
        col = jnp.where(take, ind, mt.shape[1])
        mt = jnp.where(
            (jnp.arange(mt.shape[1])[None, :] == col)
            & (jnp.arange(n)[:, None] != i), 0.0, mt)
        return ids, mt, num

    ids0 = jnp.full((n,), -1, jnp.int32)
    ids, _, _ = jax.lax.fori_loop(0, n, assign_body,
                                  (ids0, match, state.num_tracks))

    is_new = keep & (ids == -1) & (scores > cfg.init_score_thr)
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    ids = jnp.where(is_new, state.num_tracks + new_rank, ids)
    num_tracks = state.num_tracks + is_new.sum()

    # ---- memory update (update :83-151) ---------------------------------
    def upd_body(i, st):
        (bbox_, embed_, label_, score_, sids, vel, accf, lastf,
         valid) = st
        tracked = keep[i] & (ids[i] > -1)
        same = sids == ids[i]
        exists = (same & valid).any()
        slot_same = jnp.argmax(same & valid)
        free = ~valid
        stale = jnp.argmin(jnp.where(valid, lastf, -(10 ** 9)))
        slot_new = jnp.where(free.any(), jnp.argmax(free), stale)
        s = jnp.where(exists, slot_same, slot_new)

        dt = jnp.maximum(frame_id - lastf[s], 1).astype(jnp.float32)
        v_new = (bboxes[i] - bbox_[s]) / dt
        v_acc = (vel[s] * accf[s] + v_new) / (accf[s] + 1)
        m = cfg.memo_momentum
        e_upd = (1 - m) * embed_[s] + m * embeds[i]

        def w(a, old, new):
            return a.at[s].set(jnp.where(
                tracked, jnp.where(exists, new, old), a[s]))

        bbox_ = bbox_.at[s].set(jnp.where(tracked, bboxes[i], bbox_[s]))
        embed_ = w(embed_, embeds[i], e_upd)
        label_ = label_.at[s].set(jnp.where(tracked, labels[i], label_[s]))
        score_ = score_.at[s].set(jnp.where(tracked, scores[i], score_[s]))
        sids = sids.at[s].set(jnp.where(tracked, ids[i], sids[s]))
        vel = w(vel, jnp.zeros(4), v_acc)
        accf = w(accf, 0.0, accf[s] + 1)
        lastf = lastf.at[s].set(jnp.where(tracked, frame_id, lastf[s]))
        valid = valid.at[s].set(jnp.where(tracked, True, valid[s]))
        return (bbox_, embed_, label_, score_, sids, vel, accf, lastf,
                valid)

    upd = jax.lax.fori_loop(
        0, n, upd_body,
        (state.bbox, state.embed, state.label, state.score, state.ids,
         state.velocity, state.acc_frame, state.last_frame, state.valid))
    bbox_, embed_, label_, score_, sids, vel, accf, lastf, valid = upd

    # retention (:142-147)
    valid = valid & (frame_id - lastf < cfg.memo_tracklet_frames)

    # backdrops: unmatched dets, deduped against ALL dets at backdrop IoU
    # (:127-140); memo_backdrop_frames=1 -> replace the buffer
    bd_cand = keep & (ids == -1)

    def bd_body(i, sel):
        earlier = (jnp.arange(n) < i)
        clash = ((ious_dd[i] > cfg.nms_backdrop_iou_thr)
                 & earlier & det_valid).any()
        return sel.at[i].set(sel[i] & ~clash)

    bd_sel = jax.lax.fori_loop(0, n, bd_body, bd_cand)
    b = cfg.num_backdrops
    order_bd = jnp.argsort(~bd_sel)
    take = order_bd[:b]
    bd_valid = bd_sel[take]
    bd_bbox = bboxes[take]
    bd_embed = embeds[take]
    bd_label = labels[take]

    new_state = QDTrackState(bbox_, embed_, label_, score_, sids, vel,
                             accf, lastf, valid, bd_bbox, bd_embed,
                             bd_label, bd_valid, num_tracks)
    # return ids in the caller's original detection order
    inv = jnp.argsort(order)
    return new_state, ids[inv]


# ---------------------------------------------------------------------------
# training losses (quasi_dense_embed_head.py:231-350)
# ---------------------------------------------------------------------------

def multi_pos_cross_entropy(sim: jnp.ndarray, pos: jnp.ndarray,
                            valid: jnp.ndarray) -> jnp.ndarray:
    """Multi-positive cross-entropy over a key-vs-ref similarity matrix
    (mmtrack MultiPosCrossEntropyLoss): per row,
    ``log(1 + sum_neg exp(s_n) * sum_pos exp(-s_p))``."""
    neg = valid & ~pos
    pos_term = jnp.where(pos, -sim, _NEG)
    neg_term = jnp.where(neg, sim, _NEG)
    lse_pos = jax.nn.logsumexp(pos_term, axis=1)
    lse_neg = jax.nn.logsumexp(neg_term, axis=1)
    row_has_pos = pos.any(axis=1)
    loss = jax.nn.softplus(lse_pos + lse_neg)   # stable log1p(exp(.))
    return jnp.where(row_has_pos, loss, 0.0).sum() \
        / jnp.maximum(row_has_pos.sum(), 1)


def qdtrack_aux_loss(key_embeds: jnp.ndarray, ref_embeds: jnp.ndarray,
                     pos: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Auxiliary cosine-similarity L2 loss: cosine of matched pairs pulled
    to 1, unmatched to 0 (loss_track_aux L2Loss semantics)."""
    k = key_embeds / jnp.maximum(
        jnp.linalg.norm(key_embeds, axis=1, keepdims=True), 1e-12)
    r = ref_embeds / jnp.maximum(
        jnp.linalg.norm(ref_embeds, axis=1, keepdims=True), 1e-12)
    cos = k @ r.T
    tgt = pos.astype(jnp.float32)
    err = (cos - tgt) ** 2 * valid
    return err.sum() / jnp.maximum(valid.sum(), 1)


class QDTrackModule(nn.Module):
    """Faster R-CNN (ResNet-50 + FPN) + quasi-dense embed head — the
    detector+track_head pair of the reference QDTrack model
    (/root/reference/mmtrack/models/mot/qdtrack.py)."""
    num_classes: int = 1
    embed_gn: bool = False
    # tiny-config backbone knobs (default = canonical r50)
    stage_blocks: Tuple[int, ...] = None
    base_width: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        from .resnet import ResNet
        from .two_stage import FPN, BBoxHead, RPNHead
        self.backbone = ResNet(out_indices=(0, 1, 2, 3),
                               stage_blocks=self.stage_blocks,
                               base_width=self.base_width,
                               dtype=self.dtype)
        self.neck = FPN(dtype=self.dtype)
        self.rpn_head = RPNHead(3, feat_channels=256, dtype=self.dtype)
        self.bbox_head = BBoxHead(self.num_classes, dtype=self.dtype)
        self.embed_head = QuasiDenseEmbedHead(use_gn=self.embed_gn,
                                              dtype=self.dtype)

    def extract_feat(self, img, train: bool = False):
        return self.neck(self.backbone(img, train), train)

    def rpn_all_levels(self, feats, train: bool = False):
        cls_list, reg_list = [], []
        for f in feats:
            c, r = self.rpn_head(f, train)
            cls_list.append(c.reshape(c.shape[0], -1))
            reg_list.append(r.reshape(r.shape[0], -1, 4))
        return (jnp.concatenate(cls_list, 1),
                jnp.concatenate(reg_list, 1))

    def roi_bbox(self, feats, rois, train: bool = False):
        from .two_stage import fpn_roi_align
        rf = fpn_roi_align([f[0] for f in feats], rois, 7)
        return self.bbox_head(rf, train)

    def roi_embed(self, feats, rois):
        from .two_stage import fpn_roi_align
        rf = fpn_roi_align([f[0] for f in feats], rois, 7)
        return self.embed_head(rf)

    def __call__(self, img, train: bool = False):
        from .two_stage import (TwoStageConfig, fpn_anchors, rpn_proposals)
        cfg = TwoStageConfig(num_classes=self.num_classes,
                             anchor_scales=(8,))
        feats = self.extract_feat(img, train)
        cls, reg = self.rpn_all_levels(feats, train)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.asarray(fpn_anchors(shapes, cfg.anchor_scales,
                                          cfg.anchor_ratios))
        rois, _, valid = rpn_proposals(
            cls[0], reg[0], anchors, (img.shape[1], img.shape[2]), cfg)
        ccls, creg, _ = self.roi_bbox(feats, rois, train)
        emb = self.roi_embed(feats, rois[:32])
        return ccls, creg, emb


class QDTrackStreaming:
    """Per-frame streaming QDTrack: detect -> roi embeddings -> bisoftmax
    association (qdtrack.py predict path)."""

    def __init__(self, variables, num_classes: int = 1,
                 cfg: QDTrackConfig = QDTrackConfig(), dtype=jnp.float32,
                 module=None):
        from .two_stage import TwoStageConfig
        self.cfg = cfg
        self.det_cfg = TwoStageConfig(num_classes=num_classes,
                                      anchor_scales=(8,))
        self.module = module or QDTrackModule(num_classes, dtype=dtype)
        self.variables = variables
        self._detect = jax.jit(self._detect_impl,
                               static_argnames=('img_shape',))
        self.state = init_state(cfg)

    def _detect_impl(self, img, img_shape):
        from .two_stage import (fpn_anchors, rcnn_predict, rpn_proposals)
        feats = self.module.apply(self.variables, img,
                                  method=QDTrackModule.extract_feat)
        cls, reg = self.module.apply(self.variables, feats,
                                     method=QDTrackModule.rpn_all_levels)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.asarray(fpn_anchors(shapes,
                                          self.det_cfg.anchor_scales,
                                          self.det_cfg.anchor_ratios))
        rois, _, valid = rpn_proposals(cls[0], reg[0], anchors, img_shape,
                                       self.det_cfg)
        ccls, creg, _ = self.module.apply(self.variables, feats, rois,
                                          method=QDTrackModule.roi_bbox)
        res = rcnn_predict(ccls, creg, rois, valid, img_shape,
                           self.det_cfg)
        embeds = self.module.apply(self.variables, feats, res.boxes,
                                   method=QDTrackModule.roi_embed)
        return res, embeds

    def reset(self):
        self.state = init_state(self.cfg)

    def track(self, img, frame_id: int):
        """img (1, H, W, 3). Returns dict of per-detection arrays with
        assigned instance ids (-1 dropped / -2 suppressed)."""
        img = jnp.asarray(img, jnp.float32)
        if frame_id == 0:
            self.reset()
        res, embeds = self._detect(img, (img.shape[1], img.shape[2]))
        self.state, ids = qdtrack_step(
            self.state, res.boxes, res.scores, res.labels, embeds,
            res.valid, jnp.int32(frame_id), self.cfg)
        return dict(bboxes=res.boxes, scores=res.scores,
                    labels=res.labels, instances_id=ids,
                    valid=res.valid & (ids > -1))


def qdtrack_track_loss(key_embeds: jnp.ndarray, ref_embeds: jnp.ndarray,
                       key_ids: jnp.ndarray, ref_ids: jnp.ndarray,
                       key_valid: jnp.ndarray, ref_valid: jnp.ndarray,
                       loss_weight: float = 0.25,
                       aux_weight: float = 1.0) -> dict:
    """QDTrack embedding losses over sampled key/ref proposals
    (quasi_dense_embed_head.py loss: MultiPosCrossEntropy on the dot
    similarity + cosine aux L2; reference weights 0.25 / 1.0)."""
    pos = ((key_ids[:, None] == ref_ids[None, :]) & (key_ids[:, None] >= 0)
           & key_valid[:, None] & ref_valid[None, :])
    valid = key_valid[:, None] & ref_valid[None, :]
    sim = key_embeds @ ref_embeds.T
    return dict(
        loss_track=loss_weight * multi_pos_cross_entropy(sim, pos, valid),
        loss_track_aux=aux_weight * qdtrack_aux_loss(
            key_embeds, ref_embeds, pos, valid))


def qdtrack_train_loss_fn(module: 'QDTrackModule', num_rois: int = 64):
    """Build the jitted QDTrack training loss over a key/ref frame pair
    (/root/reference/mmtrack/models/mot/qdtrack.py loss: detector RPN +
    RCNN losses on the key frame, quasi-dense embedding losses over
    proposals of both frames matched by instance id).

    TPU-native fixed-shape sampling: rois = concat(gt, top proposals)
    per frame; positives carry their matched instance id.

    ``batch``: img/ref_img (1, H, W, 3), gt_bboxes/ref_gt_bboxes (G, 4),
    gt_labels (G,), gt_ids/ref_gt_ids (G,), gt_valid/ref_gt_valid (G,).
    """
    from .two_stage import (TwoStageConfig, fpn_anchors, max_iou_assign,
                            rcnn_loss, rcnn_sample_rois, rpn_loss,
                            rpn_proposals)

    cfg = TwoStageConfig(num_classes=module.num_classes, anchor_scales=(8,),
                         num_proposals=num_rois)

    def frame_rois(variables, img, gt_bboxes, gt_ids, gt_valid):
        # only the backbone carries batch_stats; the heads are stateless
        feats, updates = module.apply(
            variables, img, True, method=QDTrackModule.extract_feat,
            mutable=['batch_stats'])
        cls, reg = module.apply({**variables, **updates}, feats, True,
                                method=QDTrackModule.rpn_all_levels)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.asarray(fpn_anchors(shapes, cfg.anchor_scales,
                                          cfg.anchor_ratios))
        rois, _, rvalid = rpn_proposals(
            cls[0], reg[0], anchors, (img.shape[1], img.shape[2]), cfg)
        all_rois = jnp.concatenate([gt_bboxes, rois], 0)
        all_valid = jnp.concatenate([gt_valid, rvalid], 0)
        assigned, _ = max_iou_assign(all_rois, gt_bboxes, gt_valid,
                                     0.7, 0.3, match_low_quality=False)
        ids = jnp.where((assigned > 0) & all_valid,
                        gt_ids[jnp.clip(assigned - 1, 0,
                                        gt_ids.shape[0] - 1)], -1)
        return feats, updates, (cls, reg, anchors), all_rois, all_valid, ids

    def loss_fn(params, rest, batch, key):
        variables = {'params': params, **rest}
        feats, upd1, (cls, reg, anchors), k_rois, k_valid, k_ids = \
            frame_rois(variables, batch['img'], batch['gt_bboxes'],
                       batch['gt_ids'], batch['gt_valid'])
        v2 = {**variables, **upd1}
        ref_feats, upd2, _, r_rois, r_valid, r_ids = \
            frame_rois(v2, batch['ref_img'], batch['ref_gt_bboxes'],
                       batch['ref_gt_ids'], batch['ref_gt_valid'])
        v3 = {**v2, **upd2}

        k1, k2 = jax.random.split(key)
        losses = rpn_loss(cls[0], reg[0], anchors, batch['gt_bboxes'],
                          batch['gt_valid'], k1)
        rois, labels, reg_t, pos_mask, valid = rcnn_sample_rois(
            k_rois[batch['gt_bboxes'].shape[0]:],
            k_valid[batch['gt_bboxes'].shape[0]:],
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'], k2)
        ccls, creg, _ = module.apply(v3, feats, rois, True,
                                     method=QDTrackModule.roi_bbox)
        losses.update(rcnn_loss(ccls, creg, labels, reg_t, pos_mask, valid,
                                module.num_classes))

        k_emb = module.apply(v3, feats, k_rois,
                             method=QDTrackModule.roi_embed)
        r_emb = module.apply(v3, ref_feats, r_rois,
                             method=QDTrackModule.roi_embed)
        losses.update(qdtrack_track_loss(k_emb, r_emb, k_ids, r_ids,
                                         k_valid, r_valid))
        total = sum(losses.values())
        return total, (losses, upd2)

    return loss_fn
