"""Bounding-box geometry as pure jittable functions.

Behavioral contract mirrors the reference converters
(``/root/reference/mmtrack/structures/bbox/transforms.py:72-101`` and
``mmtrack/models/trackers/utils.py:58-73``) but is written batch-first for
TPU: every function maps ``(..., 4)`` arrays with no data-dependent shapes.
"""
from __future__ import annotations

import jax.numpy as jnp


def bbox_xyxy_to_cxcyah(bboxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, a=w/h, h).

    Ref semantics: mmtrack/structures/bbox/transforms.py:72-86.
    """
    x1, y1, x2, y2 = jnp.moveaxis(bboxes, -1, 0)
    cx = (x2 + x1) / 2.0
    cy = (y2 + y1) / 2.0
    w = x2 - x1
    h = y2 - y1
    return jnp.stack([cx, cy, w / h, h], axis=-1)


def bbox_cxcyah_to_xyxy(bboxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, a, h) -> (x1, y1, x2, y2).

    Ref semantics: mmtrack/structures/bbox/transforms.py:89-101.
    """
    cx, cy, ratio, h = jnp.moveaxis(bboxes, -1, 0)
    w = ratio * h
    return jnp.stack(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1)


def bbox_xyxy_to_cxcywh(bboxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.moveaxis(bboxes, -1, 0)
    return jnp.stack(
        [(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1, y2 - y1], axis=-1)


def bbox_cxcywh_to_xyxy(bboxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.moveaxis(bboxes, -1, 0)
    return jnp.stack(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1)


def bbox_xyxy_to_x1y1wh(bboxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.moveaxis(bboxes, -1, 0)
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def scale_bbox(bboxes: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Center-preserving width/height scaling of xyxy boxes.

    Ref semantics: mmtrack/models/trackers/utils.py:58-73. ``scales`` is
    broadcast against the leading box dimensions.
    """
    x1, y1, x2, y2 = jnp.moveaxis(bboxes, -1, 0)
    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    w = (x2 - x1) * scales
    h = (y2 - y1) * scales
    return jnp.stack(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1)


def bbox_area(bboxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.moveaxis(bboxes, -1, 0)
    return (x2 - x1) * (y2 - y1)


def bbox_iou_matrix(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray,
                    eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise IoU between two xyxy box sets -> (N, M).

    Matches mmdet ``bbox_overlaps(..., mode='iou', is_aligned=False)``
    semantics: degenerate (zero/negative area) intersections clamp to 0.
    """
    a1 = bbox_area(bboxes1)  # (N,)
    a2 = bbox_area(bboxes2)  # (M,)
    lt = jnp.maximum(bboxes1[..., :, None, :2], bboxes2[..., None, :, :2])
    rb = jnp.minimum(bboxes1[..., :, None, 2:], bboxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[..., :, None] + a2[..., None, :] - inter
    union = jnp.maximum(union, eps)
    return inter / union


def bbox_iou_aligned(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray,
                     eps: float = 1e-6) -> jnp.ndarray:
    """Element-aligned IoU between equal-shaped xyxy box sets -> (...,)."""
    a1 = bbox_area(bboxes1)
    a2 = bbox_area(bboxes2)
    lt = jnp.maximum(bboxes1[..., :2], bboxes2[..., :2])
    rb = jnp.minimum(bboxes1[..., 2:], bboxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = jnp.maximum(a1 + a2 - inter, eps)
    return inter / union
