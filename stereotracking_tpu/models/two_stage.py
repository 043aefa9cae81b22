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
    pw = priors[:, 2] - priors[:, 0]
    ph = priors[:, 3] - priors[:, 1]
    px = (priors[:, 0] + priors[:, 2]) * 0.5
    py = (priors[:, 1] + priors[:, 3]) * 0.5
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
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
                               out_indices=(3,), dtype=self.dtype)
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
