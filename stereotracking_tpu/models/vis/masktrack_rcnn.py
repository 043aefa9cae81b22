"""MaskTrack R-CNN video instance segmentation, TPU-native.

Re-creates the reference stack:

* model    /root/reference/mmtrack/models/vis/masktrack_rcnn.py
  (Mask R-CNN detector + RoI track head + score/iou/label tracker)
* embed head /root/reference/mmtrack/models/track_heads/roi_embed_head.py
  (RoI convs/fcs -> embedding; similarity = dot product with a zero
  "new-object" dummy column, :372-391)
* tracker  /root/reference/mmtrack/models/trackers/masktrack_rcnn_tracker.py
  (match score = log softmax(similarity) + w_det*log score + w_iou*iou +
  w_label*label-equality, greedy per-det argmax with best-score keeps)

TPU-first: Mask R-CNN runs on the FPN two-stage core with branch-free
level-masked RoIAlign; the tracker keeps a fixed K-slot embedding memory
and resolves the reference's sequential best-match loop with an exact
``lax.fori_loop``.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..resnet import ResNet
from ..two_stage import (FPN, TwoStageConfig, BBoxHead, RPNHead, fpn_anchors,
                         fpn_roi_align, iou_matrix, rcnn_predict,
                         rpn_proposals)  # noqa: F401


class FCNMaskHead(nn.Module):
    """mmdet FCNMaskHead: 4 3x3 convs, 2x deconv, 1x1 per-class logits."""
    num_classes: int
    channels: int = 256
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f'conv{i}')(x))
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name='upsample')(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name='logits')(x)


class RoIEmbedHead(nn.Module):
    """RoI feature -> track embedding (roi_embed_head.py:126-155; the
    canonical config: 2 fcs of 1024, no convs)."""
    fc_dim: int = 1024
    num_fcs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name=f'fc{i}')(x))
        return x


def similarity_logits(embeds: jnp.ndarray, ref_embeds: jnp.ndarray
                      ) -> jnp.ndarray:
    """Dot-product similarity with the zero dummy (new-object) column
    FIRST (roi_embed_head.py:385-390)."""
    sim = embeds @ ref_embeds.T
    return jnp.concatenate([jnp.zeros((embeds.shape[0], 1)), sim], axis=1)


class MaskTrackRCNNModule(nn.Module):
    """Mask R-CNN (ResNet-50 + FPN) + RoI embed head."""
    cfg: TwoStageConfig = TwoStageConfig(
        num_classes=40, anchor_scales=(8,), stride=4)   # YouTube-VIS 40
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(out_indices=(0, 1, 2, 3),
                               stage_blocks=self.cfg.stage_blocks,
                               base_width=self.cfg.base_width,
                               dtype=self.dtype)
        self.neck = FPN(dtype=self.dtype)
        self.rpn_head = RPNHead(len(self.cfg.anchor_ratios) *
                                len(self.cfg.anchor_scales),
                                feat_channels=256, dtype=self.dtype)
        self.bbox_head = BBoxHead(self.cfg.num_classes, dtype=self.dtype)
        self.mask_head = FCNMaskHead(self.cfg.num_classes, dtype=self.dtype)
        self.embed_head = RoIEmbedHead(dtype=self.dtype)

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
        rf = fpn_roi_align([f[0] for f in feats], rois, self.cfg.roi_size)
        return self.bbox_head(rf, train)

    def roi_mask(self, feats, rois, train: bool = False):
        rf = fpn_roi_align([f[0] for f in feats], rois, 14)
        return self.mask_head(rf, train)      # (R, 28, 28, C)

    def roi_embed(self, feats, rois):
        rf = fpn_roi_align([f[0] for f in feats], rois, self.cfg.roi_size)
        return self.embed_head(rf)

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        cls, reg = self.rpn_all_levels(feats, train)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.asarray(fpn_anchors(shapes, self.cfg.anchor_scales,
                                          self.cfg.anchor_ratios))
        rois, _, valid = rpn_proposals(
            cls[0], reg[0], anchors, (img.shape[1], img.shape[2]), self.cfg)
        ccls, creg, _ = self.roi_bbox(feats, rois, train)
        masks = self.roi_mask(feats, rois[:8], train)
        emb = self.roi_embed(feats, rois[:8])
        return ccls, creg, masks, emb


class VISTrackState(NamedTuple):
    embeds: jnp.ndarray      # (K, E)
    bboxes: jnp.ndarray      # (K, 4)
    labels: jnp.ndarray      # (K,)
    ids: jnp.ndarray         # (K,)
    valid: jnp.ndarray       # (K,)
    num_tracks: jnp.ndarray  # ()


def init_vis_state(num_slots: int, embed_dim: int = 1024) -> VISTrackState:
    return VISTrackState(jnp.zeros((num_slots, embed_dim)),
                         jnp.zeros((num_slots, 4)),
                         jnp.zeros((num_slots,), jnp.int32),
                         jnp.full((num_slots,), -1, jnp.int32),
                         jnp.zeros((num_slots,), bool),
                         jnp.zeros((), jnp.int32))


def masktrack_match_scores(bboxes, labels, scores, embeds,
                           state: VISTrackState,
                           det_score_w: float = 1.0, iou_w: float = 2.0,
                           label_w: float = 10.0) -> jnp.ndarray:
    """(N, K+1) match scores, col 0 = new object
    (masktrack_rcnn_tracker.py:37-76)."""
    sim = similarity_logits(embeds, state.embeds)          # (N, K+1)
    sim = jnp.where(jnp.concatenate(
        [jnp.ones((1,), bool), state.valid])[None, :], sim, -1e9)
    s = jax.nn.log_softmax(sim, axis=1)
    ious = iou_matrix(bboxes, state.bboxes)
    ious = jnp.where(state.valid[None, :], ious, 0.0)
    ious = jnp.concatenate([jnp.zeros((len(bboxes), 1)), ious], 1)
    lbl = (labels[:, None] == state.labels[None, :]) & state.valid[None, :]
    lbl = jnp.concatenate(
        [jnp.ones((len(bboxes), 1), bool), lbl], 1).astype(jnp.float32)
    return (s + det_score_w * jnp.log(jnp.clip(scores, 1e-12))[:, None]
            + iou_w * ious + label_w * lbl)


def masktrack_assign(match_scores: jnp.ndarray, det_valid: jnp.ndarray,
                     state: VISTrackState):
    """Exact transcription of MaskTrackRCNNTracker.assign_ids:78-95:
    greedy per-detection argmax; a previous track keeps only its
    best-scoring match; new ids are allocated in detection order."""
    n, k1 = match_scores.shape
    k = k1 - 1

    def body(i, carry):
        ids, best, num = carry
        m = jnp.argmax(match_scores[i])
        is_new = (m == 0) & det_valid[i]
        score = match_scores[i, m]
        better = det_valid[i] & (m > 0) & (score > best[m - 1])
        ids = ids.at[i].set(jnp.where(
            is_new, num, jnp.where(better, state.ids[m - 1], -1)))
        best = best.at[m - 1].set(
            jnp.where(better, score, best[m - 1]))
        num = num + is_new.astype(jnp.int32)
        return ids, best, num

    ids0 = jnp.full((n,), -1, jnp.int32)
    best0 = jnp.full((k,), -1e6)
    ids, _, num = jax.lax.fori_loop(
        0, n, body, (ids0, best0, state.num_tracks))
    return ids, num


def masktrack_update(state: VISTrackState, ids, bboxes, labels, embeds,
                     det_valid) -> VISTrackState:
    """Slot update: matched detections refresh their track slot; new ids
    occupy free slots (eviction: oldest-id slot when full)."""
    k = state.ids.shape[0]

    def body(i, st):
        keep = det_valid[i] & (ids[i] >= 0)
        # slot of an existing id, else a free slot, else lowest-id slot
        is_same = st.ids == ids[i]
        has_same = is_same.any()
        free = ~st.valid
        slot = jnp.where(
            has_same, jnp.argmax(is_same),
            jnp.where(free.any(), jnp.argmax(free),
                      jnp.argmin(jnp.where(st.valid, st.ids, 2 ** 30))))
        upd = lambda a, v: a.at[slot].set(jnp.where(keep, v, a[slot]))
        return VISTrackState(
            upd(st.embeds, embeds[i]), upd(st.bboxes, bboxes[i]),
            upd(st.labels, labels[i]), upd(st.ids, ids[i]),
            upd(st.valid, True), st.num_tracks)

    st = jax.lax.fori_loop(0, ids.shape[0], body, state)
    return st._replace(num_tracks=jnp.maximum(st.num_tracks,
                                              jnp.where(det_valid,
                                                        ids + 1, 0).max()))


class MaskTrackRCNNStreaming:
    """Per-frame streaming MaskTrack R-CNN: detect + segment + embed ->
    score/iou/label matching (the reference model's predict path,
    masktrack_rcnn.py:150-180 + masktrack_rcnn_tracker.track)."""

    def __init__(self, variables, cfg: TwoStageConfig = TwoStageConfig(
            num_classes=40, anchor_scales=(8,), stride=4),
            num_slots: int = 64, dtype=jnp.float32, module=None):
        self.cfg = cfg
        self.module = module or MaskTrackRCNNModule(cfg, dtype=dtype)
        self.variables = variables
        self.num_slots = num_slots
        self._detect = jax.jit(self._detect_impl,
                               static_argnames=('img_shape',))
        self.state = init_vis_state(num_slots)

    def _detect_impl(self, img, img_shape):
        feats = self.module.apply(self.variables, img,
                                  method=MaskTrackRCNNModule.extract_feat)
        cls, reg = self.module.apply(
            self.variables, feats,
            method=MaskTrackRCNNModule.rpn_all_levels)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.asarray(fpn_anchors(shapes, self.cfg.anchor_scales,
                                          self.cfg.anchor_ratios))
        rois, _, valid = rpn_proposals(cls[0], reg[0], anchors, img_shape,
                                       self.cfg)
        ccls, creg, _ = self.module.apply(
            self.variables, feats, rois,
            method=MaskTrackRCNNModule.roi_bbox)
        res = rcnn_predict(ccls, creg, rois, valid, img_shape, self.cfg)
        masks = self.module.apply(self.variables, feats, res.boxes,
                                  method=MaskTrackRCNNModule.roi_mask)
        embeds = self.module.apply(self.variables, feats, res.boxes,
                                   method=MaskTrackRCNNModule.roi_embed)
        return res, masks, embeds

    def reset(self):
        self.state = init_vis_state(self.num_slots)

    def track(self, img, frame_id: int):
        """img (1, H, W, 3). Returns per-detection dict incl. 28x28 mask
        logits and assigned instance ids."""
        img = jnp.asarray(img, jnp.float32)
        if frame_id == 0:
            self.reset()
        res, masks, embeds = self._detect(
            img, (img.shape[1], img.shape[2]))
        scores = masktrack_match_scores(res.boxes, res.labels, res.scores,
                                        embeds, self.state)
        ids, _ = masktrack_assign(scores, res.valid, self.state)
        self.state = masktrack_update(self.state, ids, res.boxes,
                                      res.labels, embeds, res.valid)
        return dict(bboxes=res.boxes, scores=res.scores,
                    labels=res.labels, masks=masks, instances_id=ids,
                    valid=res.valid & (ids >= 0))


def masktrack_train_loss_fn(module: MaskTrackRCNNModule, num_rois: int = 64):
    """Build the jitted MaskTrack R-CNN training loss over a key/ref
    frame pair (reference masktrack_rcnn.py loss path: Mask R-CNN
    detector losses + the track-head cross-entropy over ref-frame
    instance matching, roi_track_head.py loss):

    * RPN BCE+L1 and RCNN CE+L1 on the key frame (shared two-stage
      samplers);
    * mask head: per-instance BCE of the 28x28 logits (gt-label channel)
      against the gt mask cropped to the box — heads are trained on the
      gt boxes (cited simplification of sampled positive rois; the
      limiting case of the reference's sampler);
    * track head: CE over ``similarity_logits`` columns [dummy, ref...]
      with target = matching ref instance (dummy when unmatched).

    ``batch``: img/ref_img (1, H, W, 3); gt_bboxes (G, 4), gt_labels,
    gt_ids, gt_valid; gt_masks (G, H, W) float in {0,1};
    ref_gt_bboxes/ref_gt_ids/ref_gt_valid.
    """
    from ...ops.roi_align import roi_align
    from ..two_stage import (TwoStageConfig, fpn_anchors, rcnn_loss,
                             rcnn_sample_rois, rpn_loss, rpn_proposals)

    cfg = module.cfg

    def loss_fn(params, rest, batch, key):
        variables = {'params': params, **rest}
        img, ref_img = batch['img'], batch['ref_img']
        feats, upd = module.apply(
            variables, img, True, method=MaskTrackRCNNModule.extract_feat,
            mutable=['batch_stats'])
        v2 = {**variables, **upd}
        ref_feats, upd2 = module.apply(
            v2, ref_img, True, method=MaskTrackRCNNModule.extract_feat,
            mutable=['batch_stats'])
        v3 = {**v2, **upd2}

        cls, reg = module.apply(v3, feats, True,
                                method=MaskTrackRCNNModule.rpn_all_levels)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.asarray(fpn_anchors(shapes, cfg.anchor_scales,
                                          cfg.anchor_ratios))
        k1, k2 = jax.random.split(key)
        losses = rpn_loss(cls[0], reg[0], anchors, batch['gt_bboxes'],
                          batch['gt_valid'], k1)
        rois, _, rvalid = rpn_proposals(
            cls[0], reg[0], anchors, (img.shape[1], img.shape[2]), cfg)
        s_rois, s_labels, s_regt, s_pos, s_valid = rcnn_sample_rois(
            rois[:num_rois], rvalid[:num_rois], batch['gt_bboxes'],
            batch['gt_labels'], batch['gt_valid'], k2)
        ccls, creg, _ = module.apply(v3, feats, s_rois, True,
                                     method=MaskTrackRCNNModule.roi_bbox)
        losses.update(rcnn_loss(ccls, creg, s_labels, s_regt, s_pos,
                                s_valid, cfg.num_classes))

        # ---- mask head on the gt boxes
        g = batch['gt_bboxes'].shape[0]
        mlogits = module.apply(v3, feats, batch['gt_bboxes'], True,
                               method=MaskTrackRCNNModule.roi_mask)
        msize = mlogits.shape[1]
        sel = jnp.take_along_axis(
            mlogits, jnp.clip(batch['gt_labels'], 0, cfg.num_classes - 1)
            [:, None, None, None], axis=-1)[..., 0]       # (G, 28, 28)
        tgt = jax.vmap(lambda m, b: roi_align(
            m[:, :, None], b[None], msize, 1.0)[0, :, :, 0])(
            batch['gt_masks'], batch['gt_bboxes'])
        tgt = (tgt > 0.5).astype(jnp.float32)
        bce = optax_sigmoid_bce(sel, tgt).mean(axis=(1, 2))
        vmask = batch['gt_valid']
        losses['loss_mask'] = (bce * vmask).sum() / jnp.maximum(
            vmask.sum(), 1)

        # ---- track head: key gt embeds vs ref gt embeds
        k_emb = module.apply(v3, feats, batch['gt_bboxes'],
                             method=MaskTrackRCNNModule.roi_embed)
        r_emb = module.apply(v3, ref_feats, batch['ref_gt_bboxes'],
                             method=MaskTrackRCNNModule.roi_embed)
        sim = similarity_logits(k_emb, r_emb)             # (G, R+1)
        col_valid = jnp.concatenate(
            [jnp.ones((1,), bool), batch['ref_gt_valid']])
        sim = jnp.where(col_valid[None, :], sim, -1e9)
        match = (batch['gt_ids'][:, None] == batch['ref_gt_ids'][None, :]) \
            & batch['ref_gt_valid'][None, :] & (batch['gt_ids'][:, None] >= 0)
        target = jnp.where(match.any(axis=1),
                           jnp.argmax(match, axis=1) + 1, 0)
        logp = jax.nn.log_softmax(sim, axis=1)
        ce = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
        losses['loss_track'] = (ce * vmask).sum() / jnp.maximum(
            vmask.sum(), 1)

        total = sum(losses.values())
        return total, (losses, upd2)

    return loss_fn


def optax_sigmoid_bce(logits, targets):
    """Elementwise sigmoid binary cross-entropy (stable form)."""
    return jnp.maximum(logits, 0) - logits * targets \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
