"""Disparity completion / refinement research track, Flax NHWC.

Re-creates the registered multi-task components of the reference
(SURVEY.md section 2.7): the dense disparity decoder heads
(``/root/reference/mmtrack/models/dense_head/disp_head_v1.py:19-204`` — three
conv-conv blocks with 2x nearest upsampling between them and a 1x1 ReLU
regressor; ``disp_head_v2.py`` adds CBAM channel+spatial attention), the
masked BerHu loss (``losses/depth_loss.py:6-50``, adaptive threshold
``c = 0.2 max|err|``), the domain discriminator
(``discriminators/fc_discriminator.py``) and the multi-task detector that
pairs the YOLOX detector with a disparity head on the backbone's disparity
feature tap (``multi_task/yolox_disp*.py``).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM


class ConvBNELU(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    padding=[(self.kernel_size // 2,) * 2] * 2,
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='bn')(x)
        return nn.elu(x)


def _upsample_nearest_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class CBAM(nn.Module):
    """Convolutional block attention (channel gate + spatial gate)."""
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mlp = nn.Sequential([
            nn.Dense(c // self.reduction, dtype=self.dtype, name='fc1'),
            nn.relu,
            nn.Dense(c, dtype=self.dtype, name='fc2')])
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        ch_scale = jax.nn.sigmoid(avg + mx)[:, None, None, :]
        x = x * ch_scale
        sp = jnp.concatenate([jnp.max(x, -1, keepdims=True),
                              jnp.mean(x, -1, keepdims=True)], axis=-1)
        sp = nn.Conv(1, (7, 7), padding=[(3, 3)] * 2, dtype=self.dtype,
                     name='spatial')(sp)
        return x * jax.nn.sigmoid(sp)


class DispHead(nn.Module):
    """Dense disparity decoder: stride-8 features -> stride-2 disparity.

    ``use_cbam=True`` gives the V2 variant (attention after each block).
    """
    channels: int = 512
    out_channels: int = 1
    use_cbam: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_feat: bool = False):
        out = ConvBNELU(self.channels, dtype=self.dtype,
                        name='dconv1_1')(x, train)
        out = ConvBNELU(self.channels, dtype=self.dtype,
                        name='dconv1_2')(out, train)
        if self.use_cbam:
            out = CBAM(dtype=self.dtype, name='cbam1')(out)
        out = _upsample_nearest_2x(out)
        out = ConvBNELU(256, dtype=self.dtype, name='dconv2_1')(out, train)
        out = ConvBNELU(256, dtype=self.dtype, name='dconv2_2')(out, train)
        if self.use_cbam:
            out = CBAM(dtype=self.dtype, name='cbam2')(out)
        out = _upsample_nearest_2x(out)
        out = ConvBNELU(128, dtype=self.dtype, name='dconv3_1')(out, train)
        feat = ConvBNELU(128, dtype=self.dtype, name='dconv3_2')(out, train)
        pred = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name='reg')(feat)
        pred = nn.relu(pred)
        if return_feat:
            return pred, feat
        return pred


def berhu_loss(pred: jnp.ndarray, label: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None,
               loss_weight: float = 1.0) -> jnp.ndarray:
    """Masked BerHu (reverse Huber) with adaptive threshold
    c = 0.2 * max|masked error| (depth_loss.py:6-18)."""
    if mask is None:
        mask = jnp.ones_like(label)
    adiff = jnp.abs(pred - label) * mask
    c = 0.2 * jnp.max(adiff)
    t1 = jnp.where(adiff <= c, adiff, 0.0)
    t2 = jnp.where(adiff > c, (adiff * adiff + c * c) /
                   jnp.maximum(2 * c, 1e-12), 0.0)
    return loss_weight * (jnp.sum(t1) + jnp.sum(t2)) / \
        jnp.maximum(jnp.sum(mask), 1.0)


class FCDiscriminator(nn.Module):
    """Fully-convolutional domain discriminator
    (discriminators/fc_discriminator.py): 4 stride-2 convs + classifier."""
    ndf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((self.ndf, self.ndf * 2, self.ndf * 4,
                                self.ndf * 8)):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'conv{i + 1}')(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name='classifier')(x)


class YOLOXDisp(nn.Module):
    """Multi-task detector: YOLOX detection + dense disparity completion
    from the backbone's disparity stage-1 tap (multi_task/yolox_disp.py).

    Returns ((cls, reg, obj), disp_pred) — disparity is decoded from the
    stride-8 neck input level (in_index=0 of the multi-level features).
    """
    from .detector import DetectorConfig as _DC
    cfg: Any = None
    head_channels: int = 512
    use_cbam: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: dict, train: bool = False):
        from .csp_darknet import CSPDarknetDual
        from .pafpn import YOLOXPAFPN
        from .yolox_head import YOLOXHeadModule
        cfg = self.cfg
        feats = CSPDarknetDual(cfg.deepen_factor, cfg.widen_factor,
                               dtype=self.dtype, name='backbone')(
            inputs, train)
        neck = YOLOXPAFPN(deepen_factor=cfg.deepen_factor,
                          widen_factor=cfg.widen_factor, dtype=self.dtype,
                          name='neck')(feats, train)
        det_out = YOLOXHeadModule(
            num_classes=cfg.num_classes, widen_factor=cfg.widen_factor,
            strides=cfg.strides, dtype=self.dtype,
            name='bbox_head')(neck, train)
        disp_pred = DispHead(self.head_channels, use_cbam=self.use_cbam,
                             dtype=self.dtype,
                             name='disp_head')(feats[0], train)
        return det_out, disp_pred
