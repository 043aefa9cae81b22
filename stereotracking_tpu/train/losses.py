"""YOLOX training losses with SimOTA dynamic-k assignment, fixed-shape JAX.

Re-creates the behavior of the mmdet ``SimOTAAssigner`` + mmyolo
``YOLOXHead.loss_by_feat`` combination the reference configures
(/root/reference/configs/_base_/yolox_s_8x8_mmyolo.py:38-74): center-prior
candidate gating, cost = BCE(sqrt(score), onehot) + 3 * (-log IoU) +
INF * not-in-center, dynamic top-k by summed top-10 IoU, conflict resolution
by min cost; losses = sigmoid-BCE objectness over all priors, sigmoid-BCE
classification against IoU-soft one-hot targets, (1 - IoU^2) box loss
(mode='square', weight 5), optional L1 aux on encoded offsets.

TPU-first design: every image is processed with a static maximum number of
ground truths (padded, masked), the per-gt variable ``k`` selection is done
with rank-vs-k comparisons instead of gather loops, and the whole loss is one
jittable function batched with vmap.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..structures.bbox import bbox_iou_matrix

INF_COST = 100000.0
EPS = 1e-7


class SimOTAConfig(NamedTuple):
    center_radius: float = 2.5
    candidate_topk: int = 10
    iou_weight: float = 3.0
    cls_weight: float = 1.0


class YOLOXLossConfig(NamedTuple):
    num_classes: int = 1
    strides: Tuple[int, ...] = (8, 16, 32)
    assigner: SimOTAConfig = SimOTAConfig()
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 5.0
    loss_obj_weight: float = 1.0
    loss_l1_weight: float = 1.0
    use_l1: bool = False


def _bce_logits(logits, targets):
    """Sigmoid binary cross-entropy with soft targets."""
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _bce_probs(p, targets):
    p = jnp.clip(p, EPS, 1.0 - EPS)
    return -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))


def simota_assign(priors: jnp.ndarray, decoded: jnp.ndarray,
                  pred_scores: jnp.ndarray, gt_bboxes: jnp.ndarray,
                  gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                  num_classes: int, cfg: SimOTAConfig
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assign priors to ground truths for one image.

    Args:
        priors: (P, 4) = (cx, cy, stride, stride).
        decoded: (P, 4) decoded xyxy predictions.
        pred_scores: (P, C) sigmoid(cls) * sigmoid(obj).
        gt_bboxes: (G, 4) xyxy (padded).
        gt_labels: (G,) int32.
        gt_valid: (G,) bool.

    Returns:
        fg_mask (P,), matched_gt (P,) int32 (valid only where fg),
        matched_iou (P,).
    """
    px, py, stride = priors[:, 0], priors[:, 1], priors[:, 2]

    # candidate gating: center inside gt box, or inside center region
    in_box = (px[:, None] > gt_bboxes[None, :, 0]) & \
             (px[:, None] < gt_bboxes[None, :, 2]) & \
             (py[:, None] > gt_bboxes[None, :, 1]) & \
             (py[:, None] < gt_bboxes[None, :, 3])
    gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2.0
    gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2.0
    r = cfg.center_radius
    in_center = (px[:, None] > gcx[None] - r * stride[:, None]) & \
                (px[:, None] < gcx[None] + r * stride[:, None]) & \
                (py[:, None] > gcy[None] - r * stride[:, None]) & \
                (py[:, None] < gcy[None] + r * stride[:, None])
    in_any = (in_box | in_center) & gt_valid[None, :]
    in_both = in_box & in_center & gt_valid[None, :]
    valid_prior = jnp.any(in_any, axis=1)                         # (P,)

    ious = bbox_iou_matrix(decoded, gt_bboxes)                    # (P, G)
    ious = jnp.where(valid_prior[:, None] & gt_valid[None, :], ious, 0.0)
    iou_cost = -jnp.log(ious + EPS)

    onehot = jax.nn.one_hot(gt_labels, num_classes)               # (G, C)
    sq = jnp.sqrt(jnp.clip(pred_scores, 0.0, 1.0))                # (P, C)
    cls_cost = jnp.sum(
        _bce_probs(sq[:, None, :], onehot[None, :, :]), axis=-1)  # (P, G)

    cost = cls_cost * cfg.cls_weight + iou_cost * cfg.iou_weight + \
        jnp.where(in_both, 0.0, INF_COST)
    cost = jnp.where(valid_prior[:, None] & gt_valid[None, :], cost,
                     INF_COST * 2.0)

    # dynamic k per gt: clamp(int(sum top-10 ious), 1)
    topk = jax.lax.top_k(ious.T, min(cfg.candidate_topk, ious.shape[0]))[0]
    dynamic_k = jnp.maximum(jnp.sum(topk, axis=1).astype(jnp.int32), 1)

    # rank of each prior per gt by ascending cost; select rank < k
    order = jnp.argsort(cost, axis=0)                             # (P, G)
    ranks = jnp.zeros_like(order).at[
        order, jnp.arange(cost.shape[1])[None, :]].set(
        jnp.arange(cost.shape[0])[:, None].repeat(cost.shape[1], 1))
    matching = (ranks < dynamic_k[None, :]) & (cost < INF_COST)

    # conflict resolution: prior matched to >1 gt keeps min-cost gt
    n_match = jnp.sum(matching, axis=1)
    best_gt = jnp.argmin(cost, axis=1)
    keep = jax.nn.one_hot(best_gt, cost.shape[1], dtype=bool)
    # mmdet zeroes the conflicted row then sets its min-cost gt (even if that
    # gt was not among the row's matches)
    matching = jnp.where((n_match > 1)[:, None], keep, matching)

    fg = jnp.any(matching, axis=1)
    matched_gt = jnp.argmax(matching, axis=1).astype(jnp.int32)
    matched_iou = jnp.take_along_axis(
        ious, matched_gt[:, None], axis=1)[:, 0]
    return fg, matched_gt, matched_iou


def yolox_loss(cls_logits: jnp.ndarray, reg_preds: jnp.ndarray,
               obj_logits: jnp.ndarray, priors: jnp.ndarray,
               decoded: jnp.ndarray, gt_bboxes: jnp.ndarray,
               gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
               cfg: YOLOXLossConfig) -> dict:
    """Batched YOLOX loss.

    Args:
        cls_logits: (N, P, C); reg_preds: (N, P, 4) raw offsets;
        obj_logits: (N, P, 1); priors: (P, 4); decoded: (N, P, 4) xyxy;
        gt_bboxes: (N, G, 4); gt_labels: (N, G); gt_valid: (N, G).

    Returns dict(loss, loss_cls, loss_bbox, loss_obj[, loss_l1]).
    """
    scores = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)

    fg, matched_gt, matched_iou = jax.vmap(
        simota_assign, in_axes=(None, 0, 0, 0, 0, 0, None, None))(
        priors, decoded, scores, gt_bboxes, gt_labels, gt_valid,
        cfg.num_classes, cfg.assigner)

    num_pos = jnp.sum(fg)
    num_total = jnp.maximum(num_pos.astype(jnp.float32), 1.0)

    # objectness over all priors (target = fg)
    loss_obj = jnp.sum(_bce_logits(obj_logits[..., 0],
                                   fg.astype(jnp.float32))) / num_total

    # classification on fg priors: IoU-soft one-hot
    tgt_labels = jnp.take_along_axis(gt_labels, matched_gt, axis=1)
    cls_target = jax.nn.one_hot(tgt_labels, cfg.num_classes) * \
        matched_iou[..., None]
    per_cls = jnp.sum(_bce_logits(cls_logits, cls_target), axis=-1)
    loss_cls = jnp.sum(jnp.where(fg, per_cls, 0.0)) / num_total

    # bbox IoU loss (mode='square'): 1 - iou^2
    tgt_boxes = jnp.take_along_axis(
        gt_bboxes, matched_gt[..., None].repeat(4, -1), axis=1)
    iou = _aligned_iou(decoded, tgt_boxes)
    loss_bbox = jnp.sum(
        jnp.where(fg, 1.0 - jnp.square(iou), 0.0)) / num_total

    losses = dict(
        loss_cls=loss_cls * cfg.loss_cls_weight,
        loss_bbox=loss_bbox * cfg.loss_bbox_weight,
        loss_obj=loss_obj * cfg.loss_obj_weight,
    )
    if cfg.use_l1:
        # encoded targets: xy = gt_c/stride - grid, wh = log(gt_wh/stride)
        stride = priors[None, :, 2:3]
        gxy = (tgt_boxes[..., :2] + tgt_boxes[..., 2:]) / 2.0
        gwh = tgt_boxes[..., 2:] - tgt_boxes[..., :2]
        txy = (gxy - priors[None, :, :2]) / stride
        twh = jnp.log(gwh / stride + 1e-8)
        l1 = jnp.sum(jnp.abs(reg_preds - jnp.concatenate([txy, twh], -1)),
                     axis=-1)
        losses['loss_l1'] = jnp.sum(jnp.where(fg, l1, 0.0)) / num_total * \
            cfg.loss_l1_weight
    losses['loss'] = sum(losses.values())
    losses['num_pos'] = num_pos
    return losses


def _aligned_iou(b1, b2, eps=1e-16):
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / jnp.maximum(a1 + a2 - inter, eps)
