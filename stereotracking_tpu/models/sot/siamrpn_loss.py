"""SiamRPN training targets + loss, fixed-shape JAX.

Re-creates siamese_rpn_head.py:229-505 semantics:

* positive pairs: MaxIoUAssigner(pos >= 0.6, neg < 0.3,
  match_low_quality=False) of the center-origin anchors shifted to
  search-image coordinates, RandomSampler(num=64, pos_fraction=0.25) ->
  up to 16 random positives / up to 48 random negatives; weights
  ``1/n_pos/2`` (cls pos), ``1/n_neg/2`` (cls neg), ``1/n_pos`` (bbox);
* negative pairs: 16 random negatives inside the +-3-cell window around
  the target center (:322-382 — labels end up 0 everywhere, only the
  sampled entries carry weight, replicating the reference's final
  ``labels[...] = 0``);
* batch weights divided by N (:424-428); losses: weighted-sum CE and
  1.2 * weighted-sum L1 (:144-148).

All selection is fixed-shape: random subsets are taken with a
perturbed-mask top-k instead of ``torch.randperm`` — same distribution,
no dynamic shapes, jit/grad-safe.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .siamrpn import delta_encode, siamese_rpn_anchors


class SiamRPNTrainCfg(NamedTuple):
    search_size: int = 255
    exemplar_size: int = 127
    pos_iou_thr: float = 0.6
    neg_iou_thr: float = 0.3
    num_total: int = 64
    pos_fraction: float = 0.25
    num_neg_pair: int = 16
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.2
    feat_size: int = 25
    stride: int = 8


def _iou_1(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(anchors[:, :2], gt[:2])
    rb = jnp.minimum(anchors[:, 2:], gt[2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    a1 = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    a2 = (gt[2] - gt[0]) * (gt[3] - gt[1])
    return inter / jnp.maximum(a1 + a2 - inter, 1e-10)


def _random_subset(mask: jnp.ndarray, k: int, key) -> jnp.ndarray:
    """Boolean mask of up to ``k`` uniformly random True entries of
    ``mask`` (fixed-shape torch.randperm analog)."""
    scores = jax.random.uniform(key, mask.shape) + mask.astype(jnp.float32)
    _, idx = jax.lax.top_k(scores, k)
    sel = jnp.zeros_like(mask).at[idx].set(True)
    return sel & mask


def siamrpn_targets(gt_bbox: jnp.ndarray, is_positive_pair: jnp.ndarray,
                    key, cfg: SiamRPNTrainCfg = SiamRPNTrainCfg()):
    """Single-sample targets. ``gt_bbox`` xyxy in search-image coords.

    Returns (labels, label_weights, bbox_targets, bbox_weights) over
    A = feat*feat*5 anchors (spatial-major anchor-minor order)."""
    anchors = jnp.asarray(
        siamese_rpn_anchors(cfg.feat_size, cfg.stride)) \
        + cfg.search_size // 2
    num = anchors.shape[0]
    k_pos, k_neg = jax.random.split(key)

    # ---- positive-pair branch -------------------------------------------
    iou = _iou_1(anchors, gt_bbox)
    pos_mask = iou >= cfg.pos_iou_thr
    neg_mask = iou < cfg.neg_iou_thr
    max_pos = int(cfg.num_total * cfg.pos_fraction)
    max_neg = cfg.num_total - max_pos
    pos_sel = _random_subset(pos_mask, max_pos, k_pos)
    neg_sel = _random_subset(neg_mask, max_neg, k_neg)
    n_pos = pos_sel.sum()
    n_neg = neg_sel.sum()

    labels_p = pos_sel.astype(jnp.int32)
    lw_p = jnp.where(pos_sel, 1.0 / jnp.maximum(n_pos, 1) / 2, 0.0) \
        + jnp.where(neg_sel, 1.0 / jnp.maximum(n_neg, 1) / 2, 0.0)
    bt_p = jnp.where(pos_sel[:, None],
                     delta_encode(anchors, gt_bbox), 0.0)
    bw_p = jnp.where(pos_sel[:, None], 1.0 / jnp.maximum(n_pos, 1), 0.0)

    # ---- negative-pair branch (window around target center) -------------
    f, s = cfg.feat_size, cfg.stride
    tcx = (gt_bbox[0] + gt_bbox[2]) / 2
    tcy = (gt_bbox[1] + gt_bbox[3]) / 2
    cx = f // 2 + jnp.ceil(
        (tcx - cfg.search_size // 2) / s + 0.5).astype(jnp.int32)
    cy = f // 2 + jnp.ceil(
        (tcy - cfg.search_size // 2) / s + 0.5).astype(jnp.int32)
    gy, gx = jnp.meshgrid(jnp.arange(f), jnp.arange(f), indexing='ij')
    in_win = ((gx >= cx - 3) & (gx < cx + 4)
              & (gy >= cy - 3) & (gy < cy + 4))
    win_mask = jnp.repeat(in_win.reshape(-1), 5, axis=0)
    negp_sel = _random_subset(win_mask, cfg.num_neg_pair, k_neg)
    n_negp = negp_sel.sum()
    lw_n = jnp.where(negp_sel, 1.0 / jnp.maximum(n_negp, 1) / 2, 0.0)

    pos = is_positive_pair.astype(bool)
    labels = jnp.where(pos, labels_p, 0)
    lw = jnp.where(pos, lw_p, lw_n)
    bt = jnp.where(pos, bt_p, 0.0)
    bw = jnp.where(pos, bw_p, 0.0)
    return labels, lw, bt, bw


def siamrpn_loss(cls_score: jnp.ndarray, bbox_pred: jnp.ndarray,
                 gt_bboxes: jnp.ndarray, is_positive: jnp.ndarray,
                 key, cfg: SiamRPNTrainCfg = SiamRPNTrainCfg()) -> dict:
    """Batch loss from NHWC head outputs (N, H, W, 2K)/(N, H, W, 4K)."""
    n, h, w, _ = cls_score.shape
    keys = jax.random.split(key, n)
    labels, lw, bt, bw = jax.vmap(
        lambda g, p, k: siamrpn_targets(g, p, k, cfg))(
            gt_bboxes, is_positive, keys)
    lw = lw / n
    bw = bw / n

    cls = cls_score.reshape(n, h * w, 2, 5).transpose(0, 1, 3, 2) \
        .reshape(n, -1, 2)
    logp = jax.nn.log_softmax(cls, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    loss_cls = -(picked * lw).sum() * cfg.loss_cls_weight

    reg = bbox_pred.reshape(n, h * w, 4, 5).transpose(0, 1, 3, 2) \
        .reshape(n, -1, 4)
    loss_bbox = (jnp.abs(reg - bt) * bw).sum() * cfg.loss_bbox_weight
    return {'loss_rpn_cls': loss_cls, 'loss_rpn_bbox': loss_bbox}
