"""Appearance re-identification baseline (registered-but-unused in the
reference's OCSORT flow; capability parity for BaseReID/LinearReIDHead,
SURVEY.md section 2.6).

A compact Flax embedding model: CSPDarknet trunk -> global average pool ->
linear neck -> L2-normalized embedding, with an optional classification head
for training (cross-entropy + optional triplet margin loss).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .csp_darknet import CSPDarknet


class LinearReIDHead(nn.Module):
    """GAP features -> fc embedding (+ classification logits when
    ``num_classes`` is set)."""
    embed_dim: int = 256
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = jnp.mean(feats, axis=(1, 2))
        emb = nn.Dense(self.embed_dim, dtype=self.dtype, name='fc_embed')(x)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        if self.num_classes is not None:
            logits = nn.Dense(self.num_classes, dtype=self.dtype,
                              name='fc_cls')(emb)
            return emb, logits
        return emb


class BaseReID(nn.Module):
    """Trunk + head; input (N, H, W, 3) crops -> (N, D) embeddings."""
    embed_dim: int = 256
    num_classes: Optional[int] = None
    widen_factor: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops, train: bool = False):
        feats = CSPDarknet(deepen_factor=0.33, widen_factor=self.widen_factor,
                           out_indices=(4,), dtype=self.dtype,
                           name='backbone')(crops, train)[0]
        return LinearReIDHead(self.embed_dim, self.num_classes,
                              dtype=self.dtype, name='head')(feats, train)


def reid_losses(emb: jnp.ndarray, logits: jnp.ndarray, labels: jnp.ndarray,
                margin: float = 0.3) -> dict:
    """Cross-entropy + batch-hard triplet (training capability)."""
    ce = jnp.mean(-jax.nn.log_softmax(logits)[
        jnp.arange(labels.shape[0]), labels])
    d = jnp.sum((emb[:, None] - emb[None, :]) ** 2, -1)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    hardest_pos = jnp.max(jnp.where(same & ~eye, d, 0.0), axis=1)
    hardest_neg = jnp.min(jnp.where(~same, d, jnp.inf), axis=1)
    hardest_neg = jnp.where(jnp.isinf(hardest_neg), 0.0, hardest_neg)
    triplet = jnp.mean(jnp.maximum(hardest_pos - hardest_neg + margin, 0.0))
    return dict(loss_ce=ce, loss_triplet=triplet, loss=ce + triplet)


class FcBlock(nn.Module):
    """Reference ``FcModule`` (reid/fc_module.py:64-71): Linear -> optional
    BatchNorm1d -> ReLU."""
    features: int
    with_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, name='fc')(x)
        if self.with_norm:
            x = nn.BatchNorm(use_running_average=not train, name='bn')(x)
        return nn.relu(x)


class ResNetReID(nn.Module):
    """Reference-architecture ReID model for loading mmtracking checkpoints:
    ResNet-50 -> GAP -> ``num_fcs`` FcModules -> fc_out embedding
    (reid/base_reid.py + reid/linear_reid_head.py:92-118).  ``__call__``
    returns the post-``fc_out`` feature, matching the reference's
    ``mode='tensor'`` inference path used by tracker ReID extraction; the
    classifier branch (BN1d -> Linear, linear_reid_head.py:100-102,141-143)
    is exposed via :meth:`classify` for training only."""
    num_fcs: int = 1
    fc_channels: int = 1024
    out_channels: int = 128
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops, train: bool = False):
        from .resnet import ResNet
        feat = ResNet(out_indices=(3,), dtype=self.dtype,
                      name='backbone')(crops, train)[0]
        x = jnp.mean(feat, axis=(1, 2))
        for i in range(self.num_fcs):
            x = FcBlock(self.fc_channels, name=f'fcs_{i}')(x, train)
        return nn.Dense(self.out_channels, name='fc_out')(x)

    @nn.compact_name_scope
    def classify(self, emb, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, name='bn')(emb)
        return nn.Dense(self.num_classes, name='classifier')(x)
