"""YOLOX decoupled detection head (module + decode), NHWC Flax.

Re-creates the behavior of the mmyolo ``YOLOXHead``/``YOLOXHeadModule`` the
reference configures (/root/reference/configs/_base_/yolox_s_8x8_mmyolo.py:38-51):
per-level 2-stacked-conv cls and reg branches, 1x1 prediction convs for class
scores, box offsets and objectness; YOLOX decode
``xy = (pred_xy + grid) * stride``, ``wh = exp(pred_wh) * stride``.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNAct, widen


class YOLOXHeadModule(nn.Module):
    num_classes: int = 1
    in_channels: int = 256      # pre-widen
    feat_channels: int = 256    # pre-widen
    widen_factor: float = 0.5
    stacked_convs: int = 2
    strides: Sequence[int] = (8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.strides)
        feat_ch = widen(self.feat_channels, self.widen_factor)
        cls_scores, bbox_preds, objectnesses = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat = x
            for i in range(self.stacked_convs):
                cls_feat = ConvBNAct(
                    feat_ch, 3, dtype=self.dtype,
                    name=f'cls_convs_{lvl}_{i}')(cls_feat, train)
            reg_feat = x
            for i in range(self.stacked_convs):
                reg_feat = ConvBNAct(
                    feat_ch, 3, dtype=self.dtype,
                    name=f'reg_convs_{lvl}_{i}')(reg_feat, train)
            cls_scores.append(nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype,
                name=f'conv_cls_{lvl}')(cls_feat))
            bbox_preds.append(nn.Conv(
                4, (1, 1), dtype=self.dtype,
                name=f'conv_reg_{lvl}')(reg_feat))
            objectnesses.append(nn.Conv(
                1, (1, 1), dtype=self.dtype,
                name=f'conv_obj_{lvl}')(reg_feat))
        return cls_scores, bbox_preds, objectnesses


def level_priors(feat_h: int, feat_w: int, stride: int,
                 offset: float = 0.0) -> jnp.ndarray:
    """Per-anchor (cx, cy, stride, stride) prior table for one level.

    YOLOX uses offset=0 (grid corner) priors.
    """
    ys = (jnp.arange(feat_h, dtype=jnp.float32) + offset) * stride
    xs = (jnp.arange(feat_w, dtype=jnp.float32) + offset) * stride
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing='ij')
    s = jnp.full((feat_h, feat_w), float(stride), jnp.float32)
    return jnp.stack([grid_x, grid_y, s, s], axis=-1).reshape(-1, 4)


def decode_predictions(
        cls_scores: List[jnp.ndarray], bbox_preds: List[jnp.ndarray],
        objectnesses: List[jnp.ndarray],
        strides: Sequence[int] = (8, 16, 32),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flatten per-level maps and decode to (boxes_xyxy, scores).

    Returns boxes (N, A, 4) in network-input coordinates and scores
    (N, A, num_classes) = sigmoid(cls) * sigmoid(obj) (yolox_style).
    """
    all_boxes, all_scores = [], []
    for cls, reg, obj, stride in zip(cls_scores, bbox_preds, objectnesses,
                                     strides):
        n, h, w, nc = cls.shape
        priors = level_priors(h, w, stride)  # (hw, 4)
        reg = reg.reshape(n, h * w, 4).astype(jnp.float32)
        xy = reg[..., :2] * stride + priors[None, :, :2]
        wh = jnp.exp(reg[..., 2:]) * stride
        boxes = jnp.concatenate([xy - wh / 2.0, xy + wh / 2.0], axis=-1)
        score = nn.sigmoid(cls.reshape(n, h * w, nc).astype(jnp.float32)) * \
            nn.sigmoid(obj.reshape(n, h * w, 1).astype(jnp.float32))
        all_boxes.append(boxes)
        all_scores.append(score)
    return (jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1))
