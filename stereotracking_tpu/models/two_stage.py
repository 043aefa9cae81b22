"""Two-stage detector core (Faster R-CNN, single-level DC5 style), Flax.

The reference's VID / VIS / MOT-extras families sit on mmdet's FasterRCNN
(SELSA asserts a ``roi_head``, /root/reference/mmtrack/models/vid/selsa.py:34;
MaskTrackRCNN and Tracktor wrap the same detector). mmdet is not available
here, so this module re-creates the needed core the TPU way: fixed-shape
proposal lists (padded + masked), RoIAlign as a vectorized gather
(ops/roi_align.py), and fully vectorized target assignment — no dynamic
shapes anywhere.

Canonical hyperparameters follow the ImageNet-VID configs the reference
inherits (ResNet-50 DC5: strides (1,2,2,1) + dilation (1,1,1,2), single
stride-16 level; RPN anchors scales [4,8,16,32] x ratios [0.5,1,2];
Shared-2FC bbox head with class-specific deltas, target stds
[0.1, 0.1, 0.2, 0.2]).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.nms import batched_nms
from ..ops.roi_align import roi_align
from .resnet import ResNet


class TwoStageConfig(NamedTuple):
    num_classes: int = 30                  # ImageNet VID
    stride: int = 16
    anchor_scales: Tuple[int, ...] = (4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_nms_pre: int = 1024
    rpn_nms_iou: float = 0.7
    num_proposals: int = 300
    roi_size: int = 7
    rcnn_score_thr: float = 0.0001
    rcnn_nms_iou: float = 0.5
    rcnn_max_per_img: int = 100
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # tiny-config backbone knobs (None/64 = canonical r50)
    stage_blocks: Optional[Tuple[int, ...]] = None
    base_width: int = 64


def standard_anchors(feat_h: int, feat_w: int, stride: int,
                     scales: Sequence[int], ratios: Sequence[float]
                     ) -> np.ndarray:
    """mmdet AnchorGenerator grid priors (scale_major, center_offset 0),
    xyxy, flattened spatial-major anchor-minor — (H*W*A, 4)."""
    scales = np.asarray(scales, np.float64)
    ratios = np.asarray(ratios, np.float64)
    h_r = np.sqrt(ratios)
    w_r = 1.0 / h_r
    ws = (stride * w_r[:, None] * scales[None, :]).reshape(-1)
    hs = (stride * h_r[:, None] * scales[None, :]).reshape(-1)
    base = np.stack([-0.5 * ws, -0.5 * hs, 0.5 * ws, 0.5 * hs], -1)
    xs = np.arange(feat_w) * stride
    ys = np.arange(feat_h) * stride
    shift = np.stack(np.meshgrid(xs, ys, indexing='xy'), -1).reshape(-1, 2)
    shift = shift[:, [0, 1, 0, 1]]
    return (base[None] + shift[:, None, :]).reshape(-1, 4).astype(np.float32)


def delta2bbox(priors: jnp.ndarray, deltas: jnp.ndarray,
               stds: Sequence[float] = (1., 1., 1., 1.),
               max_shape: Optional[Tuple[int, int]] = None,
               wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    stds = jnp.asarray(stds, jnp.float32)
    d = deltas * stds
    pw = priors[:, 2] - priors[:, 0]
    ph = priors[:, 3] - priors[:, 1]
    px = (priors[:, 0] + priors[:, 2]) * 0.5
    py = (priors[:, 1] + priors[:, 3]) * 0.5
    max_ratio = float(np.abs(np.log(wh_ratio_clip)))
    gx = px + pw * d[:, 0]
    gy = py + ph * d[:, 1]
    gw = pw * jnp.exp(jnp.clip(d[:, 2], -max_ratio, max_ratio))
    gh = ph * jnp.exp(jnp.clip(d[:, 3], -max_ratio, max_ratio))
    out = jnp.stack([gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], -1)
    if max_shape is not None:
        h, w = max_shape
        out = jnp.stack([jnp.clip(out[:, 0], 0, w), jnp.clip(out[:, 1], 0, h),
                         jnp.clip(out[:, 2], 0, w), jnp.clip(out[:, 3], 0, h)],
                        -1)
    return out


def bbox2delta(priors: jnp.ndarray, gt: jnp.ndarray,
               stds: Sequence[float] = (1., 1., 1., 1.)) -> jnp.ndarray:
    # sign-preserving epsilon: exactly-zero-size (clipped/padded/invalid)
    # boxes otherwise put 1/0 into the backward pass, which leaks NaN
    # gradients through downstream jnp.where masks (0 * inf); nonzero
    # (including negative) sizes keep mmdet's exact numerics
    def _nz(v):
        return jnp.where(jnp.abs(v) < 1e-4,
                         jnp.where(v < 0, -1e-4, 1e-4), v)

    pw = _nz(priors[:, 2] - priors[:, 0])
    ph = _nz(priors[:, 3] - priors[:, 1])
    px = (priors[:, 0] + priors[:, 2]) * 0.5
    py = (priors[:, 1] + priors[:, 3]) * 0.5
    gw = _nz(gt[:, 2] - gt[:, 0])
    gh = _nz(gt[:, 3] - gt[:, 1])
    gx = (gt[:, 0] + gt[:, 2]) * 0.5
    gy = (gt[:, 1] + gt[:, 3]) * 0.5
    d = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                   jnp.log(gw / pw), jnp.log(gh / ph)], -1)
    return d / jnp.asarray(stds, jnp.float32)


def iou_matrix(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = jnp.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / jnp.maximum(a1[:, None] + a2[None] - inter, 1e-10)


def max_iou_assign(priors: jnp.ndarray, gt_bboxes: jnp.ndarray,
                   gt_valid: jnp.ndarray, pos_thr: float, neg_thr: float,
                   match_low_quality: bool = True,
                   min_pos_iou: float = 0.3):
    """Vectorized mmdet MaxIoUAssigner. Returns (assigned_gt (P,), int —
    -1 ignore, 0 negative, >0 gt index + 1 — and max_iou (P,))."""
    iou = iou_matrix(priors, gt_bboxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = iou.max(axis=1)
    argmax = iou.argmax(axis=1)
    assigned = jnp.where(max_iou >= pos_thr, argmax + 1, -1)
    assigned = jnp.where((max_iou < neg_thr) & (max_iou >= 0), 0, assigned)
    if match_low_quality:
        # each gt's best prior becomes positive if its iou >= min_pos_iou
        gt_best = iou.max(axis=0)                    # (G,)
        is_best = (iou == gt_best[None, :]) & (iou >= min_pos_iou) \
            & gt_valid[None, :]
        best_gt = jnp.where(is_best.any(axis=1),
                            is_best.argmax(axis=1) + 1, 0)
        assigned = jnp.where(best_gt > 0, best_gt, assigned)
    return assigned, max_iou


def random_sample_masked(mask: jnp.ndarray, k: int, key) -> jnp.ndarray:
    """Up-to-k uniformly random True entries of ``mask`` (fixed shape)."""
    scores = jax.random.uniform(key, mask.shape) + mask.astype(jnp.float32)
    _, idx = jax.lax.top_k(scores, min(k, mask.shape[0]))
    sel = jnp.zeros_like(mask).at[idx].set(True)
    return sel & mask


class RPNHead(nn.Module):
    """Single-level RPN: 3x3 conv + objectness/delta 1x1 convs (mmdet
    RPNHead semantics, sigmoid objectness)."""
    num_anchors: int
    feat_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                            dtype=self.dtype, name='conv')(x))
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name='cls')(x)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name='reg')(x)
        return cls, reg


class BBoxHead(nn.Module):
    """Shared-2FC bbox head (mmdet Shared2FCBBoxHead): two 1024-d FCs,
    softmax classification over C+1, class-specific deltas."""
    num_classes: int
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois_feat, train: bool = False):
        x = rois_feat.reshape(rois_feat.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name='fc1')(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name='fc2')(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name='cls')(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                       name='reg')(x)
        return cls, reg, x


class SelsaAggregator(nn.Module):
    """Multi-block attention over reference proposals
    (aggregators/selsa_aggregator.py:38-80, exact semantics incl. the
    per-block sqrt(d) scaling and the masked-softmax over refs)."""
    in_channels: int = 1024
    num_blocks: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ref_x, ref_valid=None):
        c = self.in_channels
        b = self.num_blocks
        d = c // b
        xe = nn.Dense(c, dtype=self.dtype, name='fc_embed')(x)
        re = nn.Dense(c, dtype=self.dtype, name='ref_fc_embed')(ref_x)
        xe = xe.reshape(-1, b, d).transpose(1, 0, 2)       # (b, N, d)
        re = re.reshape(-1, b, d).transpose(1, 2, 0)       # (b, d, M)
        w = jnp.einsum('bnd,bdm->bnm', xe, re) / (d ** 0.5)
        if ref_valid is not None:
            w = jnp.where(ref_valid[None, None, :], w, -1e9)
        w = jax.nn.softmax(w, axis=2)
        rn = nn.Dense(c, dtype=self.dtype, name='ref_fc')(ref_x)
        rn = rn.reshape(-1, b, d).transpose(1, 0, 2)       # (b, M, d)
        out = jnp.einsum('bnm,bmd->bnd', w, rn)
        out = out.transpose(1, 0, 2).reshape(-1, c)
        return nn.Dense(c, dtype=self.dtype, name='fc')(out)


class SelsaBBoxHead(nn.Module):
    """Shared-2FC head with a SELSA aggregator after each shared FC
    (roi_heads/bbox_heads/selsa_bbox_head.py:30-90: x = relu(fc(x) +
    agg(fc(x), fc(ref_x))))."""
    num_classes: int
    fc_dim: int = 1024
    num_blocks: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois_feat, ref_rois_feat, ref_valid=None,
                 train: bool = False):
        x = rois_feat.reshape(rois_feat.shape[0], -1)
        r = ref_rois_feat.reshape(ref_rois_feat.shape[0], -1)
        for i in range(2):
            fc = nn.Dense(self.fc_dim, dtype=self.dtype, name=f'fc{i + 1}')
            x, r = fc(x), fc(r)
            x = x + SelsaAggregator(self.fc_dim, self.num_blocks,
                                    dtype=self.dtype,
                                    name=f'aggregator{i}')(x, r, ref_valid)
            x, r = nn.relu(x), nn.relu(r)
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name='cls')(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                       name='reg')(x)
        return cls, reg, x


class FasterRCNN(nn.Module):
    """ResNet-50 DC5 backbone + RPN + (Selsa)BBoxHead in one module.

    ``roi_forward`` is split out so video detectors (DFF/FGFA/SELSA) can
    inject warped or aggregated features between the stages."""
    cfg: TwoStageConfig = TwoStageConfig()
    selsa: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
                               out_indices=(3,),
                               stage_blocks=self.cfg.stage_blocks,
                               base_width=self.cfg.base_width,
                               dtype=self.dtype)
        a = len(self.cfg.anchor_scales) * len(self.cfg.anchor_ratios)
        self.rpn_head = RPNHead(a, dtype=self.dtype)
        if self.selsa:
            self.bbox_head = SelsaBBoxHead(self.cfg.num_classes,
                                           dtype=self.dtype)
        else:
            self.bbox_head = BBoxHead(self.cfg.num_classes, dtype=self.dtype)

    def extract_feat(self, img, train: bool = False):
        (f,) = self.backbone(img, train)
        return f

    def rpn(self, feat, train: bool = False):
        return self.rpn_head(feat, train)

    def roi_feats(self, feat, rois):
        """RoIAlign on the single stride-16 level; feat (H, W, C),
        rois (R, 4) image coords."""
        return roi_align(feat, rois, self.cfg.roi_size,
                         spatial_scale=1.0 / self.cfg.stride)

    def roi_forward(self, rois_feat, train: bool = False):
        return self.bbox_head(rois_feat, train)

    def roi_forward_selsa(self, rois_feat, ref_rois_feat, ref_valid,
                          train: bool = False):
        return self.bbox_head(rois_feat, ref_rois_feat, ref_valid, train)

    def __call__(self, img, train: bool = False):
        """Plain single-image forward used for init/shape-inference."""
        feat = self.extract_feat(img, train)
        cls, reg = self.rpn(feat, train)
        h, w = feat.shape[1], feat.shape[2]
        anchors = jnp.asarray(standard_anchors(
            h, w, self.cfg.stride, self.cfg.anchor_scales,
            self.cfg.anchor_ratios))
        rois = anchors[:self.cfg.num_proposals]
        rf = self.roi_feats(feat[0], rois)
        if self.selsa:
            return self.bbox_head(rf, rf, None, train)
        return self.bbox_head(rf, train)


def rpn_proposals(cls: jnp.ndarray, reg: jnp.ndarray, anchors: jnp.ndarray,
                  img_shape: Tuple[int, int], cfg: TwoStageConfig
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-shape proposal generation for one image: sigmoid scores ->
    top-k -> decode -> clip -> NMS -> (num_proposals, 4) + scores + valid."""
    scores = jax.nn.sigmoid(cls.reshape(-1))
    deltas = reg.reshape(-1, 4)
    k = min(cfg.rpn_nms_pre, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, k)
    boxes = delta2bbox(anchors[top_i], deltas[top_i], max_shape=img_shape)
    labels = jnp.zeros(k, jnp.int32)
    res = batched_nms(boxes, top_s, labels, cfg.rpn_nms_iou,
                      score_threshold=0.0, pre_nms_top_k=k,
                      max_out=cfg.num_proposals)
    return res.boxes, res.scores, res.valid


def rcnn_predict(cls_logits: jnp.ndarray, reg: jnp.ndarray,
                 rois: jnp.ndarray, rois_valid: jnp.ndarray,
                 img_shape: Tuple[int, int], cfg: TwoStageConfig):
    """Decode class-specific deltas + softmax scores -> class-aware NMS.
    mmdet Shared2FCBBoxHead.predict_by_feat semantics (background is the
    LAST class; target stds applied in decode). Returns an NMSResult."""
    num_classes = cfg.num_classes
    probs = jax.nn.softmax(cls_logits, axis=-1)[:, :num_classes]  # (R, C)
    r = rois.shape[0]
    deltas = reg.reshape(r, num_classes, 4)
    boxes = jax.vmap(
        lambda d: delta2bbox(rois, d, cfg.target_stds, img_shape),
        in_axes=1, out_axes=1)(deltas)                   # (R, C, 4)
    flat_boxes = boxes.reshape(-1, 4)
    flat_scores = jnp.where(rois_valid[:, None], probs, 0.0).reshape(-1)
    flat_labels = jnp.tile(jnp.arange(num_classes), (r,))
    return batched_nms(flat_boxes, flat_scores, flat_labels,
                       cfg.rcnn_nms_iou, score_threshold=cfg.rcnn_score_thr,
                       pre_nms_top_k=min(2048, flat_scores.shape[0]),
                       max_out=cfg.rcnn_max_per_img)


def rpn_loss(cls: jnp.ndarray, reg: jnp.ndarray, anchors: jnp.ndarray,
             gt_bboxes: jnp.ndarray, gt_valid: jnp.ndarray, key,
             num_samples: int = 256, pos_fraction: float = 0.5) -> dict:
    """mmdet RPN loss: MaxIoUAssigner(0.7/0.3, low-quality matches) +
    RandomSampler(256, 0.5), BCE objectness + L1 on positives."""
    scores = cls.reshape(-1)
    deltas = reg.reshape(-1, 4)
    assigned, _ = max_iou_assign(anchors, gt_bboxes, gt_valid, 0.7, 0.3,
                                 match_low_quality=True, min_pos_iou=0.3)
    k1, k2 = jax.random.split(key)
    pos_mask = assigned > 0
    neg_mask = assigned == 0
    max_pos = int(num_samples * pos_fraction)
    pos_sel = random_sample_masked(pos_mask, max_pos, k1)
    n_pos = pos_sel.sum()
    neg_sel = random_sample_masked(neg_mask, num_samples, k2)
    # mmdet samples num - n_pos negatives; emulate by weighting the first
    # (num_samples - n_pos) — with uniform random selection, trimming a
    # uniformly random subset is itself uniform, so rank by the same
    # random scores and keep the top (num - n_pos).
    neg_rank = jnp.cumsum(neg_sel.astype(jnp.int32)) * neg_sel
    neg_sel = neg_sel & (neg_rank <= num_samples - n_pos)
    n_tot = jnp.maximum(n_pos + neg_sel.sum(), 1)

    tgt = pos_sel.astype(jnp.float32)
    w = (pos_sel | neg_sel).astype(jnp.float32)
    bce = jnp.maximum(scores, 0) - scores * tgt \
        + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    loss_cls = (bce * w).sum() / n_tot

    gt_idx = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
    t = bbox2delta(anchors, gt_bboxes[gt_idx])
    loss_reg = (jnp.abs(deltas - t).sum(-1)
                * pos_sel.astype(jnp.float32)).sum() / n_tot
    return {'loss_rpn_cls': loss_cls, 'loss_rpn_bbox': loss_reg}


def rcnn_sample_rois(proposals: jnp.ndarray, proposals_valid: jnp.ndarray,
                     gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
                     gt_valid: jnp.ndarray, key, num_samples: int = 256,
                     pos_fraction: float = 0.25):
    """RCNN stage sampling (MaxIoUAssigner 0.5/0.5 + RandomSampler with
    add_gt_as_proposals=True). Returns fixed-size roi batch:
    (rois (S, 4), labels (S,) — num_classes = background, reg_targets
    (S, 4), pos_mask (S,), valid (S,))."""
    rois = jnp.concatenate([gt_bboxes, proposals], 0)
    valid = jnp.concatenate([gt_valid, proposals_valid], 0)
    assigned, _ = max_iou_assign(rois, gt_bboxes, gt_valid, 0.5, 0.5,
                                 match_low_quality=False)
    assigned = jnp.where(valid, assigned, -1)
    k1, k2 = jax.random.split(key)
    max_pos = int(num_samples * pos_fraction)
    pos_sel = random_sample_masked(assigned > 0, max_pos, k1)
    n_pos = pos_sel.sum()
    neg_sel = random_sample_masked(assigned == 0, num_samples, k2)
    neg_rank = jnp.cumsum(neg_sel.astype(jnp.int32)) * neg_sel
    neg_sel = neg_sel & (neg_rank <= num_samples - n_pos)

    sel = pos_sel | neg_sel
    # gather the selected rois into a fixed-size block (selected first)
    order = jnp.argsort(~sel)               # True (selected) first
    take = order[:num_samples]
    out_valid = sel[take]
    out_rois = rois[take]
    a = assigned[take]
    gt_idx = jnp.clip(a - 1, 0, gt_bboxes.shape[0] - 1)
    out_pos = (a > 0) & out_valid
    labels = jnp.where(out_pos, gt_labels[gt_idx], -1)
    reg_t = bbox2delta(out_rois, gt_bboxes[gt_idx],
                       TwoStageConfig().target_stds)
    return out_rois, labels, reg_t, out_pos, out_valid


def rcnn_loss(cls_logits: jnp.ndarray, reg: jnp.ndarray,
              labels: jnp.ndarray, reg_targets: jnp.ndarray,
              pos_mask: jnp.ndarray, valid: jnp.ndarray,
              num_classes: int) -> dict:
    """Softmax CE (background = num_classes) + class-specific L1."""
    tgt = jnp.where(pos_mask, labels, num_classes)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    picked = jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    n = jnp.maximum(valid.sum(), 1)
    loss_cls = -(picked * valid).sum() / n
    r = reg.reshape(reg.shape[0], num_classes, 4)
    sel = jnp.take_along_axis(
        r, jnp.clip(labels, 0, num_classes - 1)[:, None, None]
        .repeat(4, -1), axis=1)[:, 0]
    loss_reg = (jnp.abs(sel - reg_targets).sum(-1)
                * pos_mask.astype(jnp.float32)).sum() / n
    return {'loss_cls': loss_cls, 'loss_bbox': loss_reg}


class FPN(nn.Module):
    """mmdet FPN (lateral 1x1 + top-down nearest upsample + 3x3 smooth),
    with an extra max-pool level (P6) when ``num_outs`` exceeds the inputs
    — the Mask R-CNN / QDTrack neck."""
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f'lateral{i}')(f)
                    for i, f in enumerate(feats)]
        for i in range(len(laterals) - 1, 0, -1):
            up = laterals[i]
            n, h, w, c = up.shape
            th, tw = laterals[i - 1].shape[1:3]
            up = jax.image.resize(up, (n, th, tw, c), 'nearest')
            laterals[i - 1] = laterals[i - 1] + up
        outs = [nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name=f'fpn{i}')(l)
                for i, l in enumerate(laterals)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


FPN_STRIDES = (4, 8, 16, 32, 64)


def fpn_anchors(feat_shapes: Sequence[Tuple[int, int]],
                scales: Sequence[int] = (8,),
                ratios: Sequence[float] = (0.5, 1.0, 2.0)) -> np.ndarray:
    """Concatenated per-level grid anchors for the FPN RPN."""
    all_anchors = [standard_anchors(h, w, s, scales, ratios)
                   for (h, w), s in zip(feat_shapes, FPN_STRIDES)]
    return np.concatenate(all_anchors, 0)


def fpn_roi_level(rois: jnp.ndarray, num_levels: int = 4,
                  finest_scale: float = 56.0) -> jnp.ndarray:
    """mmdet SingleRoIExtractor.map_roi_levels: level =
    floor(log2(sqrt(area) / finest_scale + 1e-6)) clamped to [0, L)."""
    # discrete selection: block gradients — sqrt has an infinite derivative
    # at zero area (degenerate/invalid rois) which floor's zero gradient
    # turns into NaN during backprop
    rois = jax.lax.stop_gradient(rois)
    scale = jnp.sqrt(jnp.clip((rois[:, 2] - rois[:, 0])
                              * (rois[:, 3] - rois[:, 1]), 0, None))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def fpn_roi_align(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                  out_size: int, sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign over FPN levels P2-P5 with scale-based level assignment.
    Computes every level for every roi and selects by mask — 4x FLOPs for
    a branch-free fixed-shape program (rois are few; TPU-friendly)."""
    lvl = fpn_roi_level(rois, num_levels=min(4, len(feats)))
    out = None
    for i in range(min(4, len(feats))):
        v = roi_align(feats[i], rois, out_size,
                      spatial_scale=1.0 / FPN_STRIDES[i],
                      sampling_ratio=sampling_ratio)
        sel = (lvl == i)[:, None, None, None]
        out = jnp.where(sel, v, 0.0) if out is None \
            else out + jnp.where(sel, v, 0.0)
    return out


def faster_rcnn_train_step_fn(module: FasterRCNN, cfg: TwoStageConfig):
    """Build the jitted Faster R-CNN training loss: RPN (BCE+L1 over
    sampled anchors) + RCNN (CE+L1 over sampled rois with gt added as
    proposals) — the two-stage loss path DFF/FGFA/SELSA train through
    (selsa.py:84-118). Returns ``loss_fn(params, rest, batch, key)``
    with batch = {img (1,H,W,3), gt_bboxes (G,4), gt_labels (G,),
    gt_valid (G,)}."""

    def loss_fn(params, rest, batch, key):
        variables = {'params': params, **rest}
        img = batch['img']
        feat, updates = module.apply(
            variables, img, train=True, mutable=['batch_stats'],
            method=FasterRCNN.extract_feat)
        variables = {'params': params, **{**rest, **updates}}
        cls, reg = module.apply(variables, feat, True,
                                method=FasterRCNN.rpn)
        h, w = feat.shape[1], feat.shape[2]
        anchors = jnp.asarray(standard_anchors(
            h, w, cfg.stride, cfg.anchor_scales, cfg.anchor_ratios))
        k1, k2 = jax.random.split(key)
        losses = rpn_loss(cls[0], reg[0], anchors, batch['gt_bboxes'],
                          batch['gt_valid'], k1)

        rois, _, valid = rpn_proposals(
            jax.lax.stop_gradient(cls[0]), jax.lax.stop_gradient(reg[0]),
            anchors, (img.shape[1], img.shape[2]), cfg)
        s_rois, labels, reg_t, pos, s_valid = rcnn_sample_rois(
            rois, valid, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'], k2)
        rf = module.apply(variables, feat[0], s_rois,
                          method=FasterRCNN.roi_feats)
        ccls, creg, _ = module.apply(variables, rf, True,
                                    method=FasterRCNN.roi_forward)
        losses.update(rcnn_loss(ccls, creg, labels, reg_t, pos, s_valid,
                                cfg.num_classes))
        total = sum(losses.values())
        return total, (losses, updates)

    return loss_fn


def selsa_train_step_fn(module: FasterRCNN, cfg: TwoStageConfig):
    """SELSA training loss (selsa.py:42-118): RPN loss on the KEY frame,
    reference-frame proposals extracted with stop-gradient RPN outputs,
    and the SELSA bbox head scoring sampled key rois against the
    aggregated reference-proposal features. ``batch`` adds
    ``ref_imgs`` (R, H, W, 3)."""
    assert module.selsa, 'build the module with selsa=True'

    def loss_fn(params, rest, batch, key):
        variables = {'params': params, **rest}
        img = batch['img']
        feat, updates = module.apply(
            variables, img, train=True, mutable=['batch_stats'],
            method=FasterRCNN.extract_feat)
        variables = {'params': params, **{**rest, **updates}}
        cls, reg = module.apply(variables, feat, True,
                                method=FasterRCNN.rpn)
        h, w = feat.shape[1], feat.shape[2]
        anchors = jnp.asarray(standard_anchors(
            h, w, cfg.stride, cfg.anchor_scales, cfg.anchor_ratios))
        k1, k2 = jax.random.split(key)
        losses = rpn_loss(cls[0], reg[0], anchors, batch['gt_bboxes'],
                          batch['gt_valid'], k1)

        img_shape = (img.shape[1], img.shape[2])
        rois, _, valid = rpn_proposals(
            jax.lax.stop_gradient(cls[0]), jax.lax.stop_gradient(reg[0]),
            anchors, img_shape, cfg)
        s_rois, labels, reg_t, pos, s_valid = rcnn_sample_rois(
            rois, valid, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'], k2)
        rf = module.apply(variables, feat[0], s_rois,
                          method=FasterRCNN.roi_feats)

        # reference-frame proposals + roi features (no grad through their
        # RPN decisions, matching rpn_head.predict on refs :101-102)
        ref_rf, ref_valid = [], []
        for r in range(batch['ref_imgs'].shape[0]):
            rfeat = module.apply(variables, batch['ref_imgs'][r][None],
                                 train=True,
                                 method=FasterRCNN.extract_feat)
            rcls, rreg = module.apply(variables, rfeat, True,
                                      method=FasterRCNN.rpn)
            rrois, _, rvalid = rpn_proposals(
                jax.lax.stop_gradient(rcls[0]),
                jax.lax.stop_gradient(rreg[0]), anchors, img_shape, cfg)
            ref_rf.append(module.apply(variables, rfeat[0], rrois,
                                       method=FasterRCNN.roi_feats))
            ref_valid.append(rvalid)
        ref_rf = jnp.concatenate(ref_rf, 0)
        ref_valid = jnp.concatenate(ref_valid, 0)

        ccls, creg, _ = module.apply(
            variables, rf, ref_rf, ref_valid, True,
            method=FasterRCNN.roi_forward_selsa)
        losses.update(rcnn_loss(ccls, creg, labels, reg_t, pos, s_valid,
                                cfg.num_classes))
        total = sum(losses.values())
        return total, (losses, updates)

    return loss_fn
