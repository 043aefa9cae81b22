"""FlowNetSimple + feature warping, Flax / NHWC.

Re-creates /root/reference/mmtrack/models/motion/flownet_simple.py
(the FlowNetS encoder/decoder: six stride-2 conv groups with LeakyReLU
0.1, deconv decoder with per-scale flow predictions and upsampled-flow
skip concatenation) and
/root/reference/mmtrack/models/task_modules/motion/flow.py:flow_warp_feats
(flow resized to the feature grid, scaled per-axis, border-padded
align-corners bilinear sampling).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_CONV_IN = (6, 64, 128, 256, 512, 512)
_CONV_K = (7, 5, 5, 3, 3, 3)
_CONV_N = (1, 1, 2, 2, 2, 2)
_DECONV_IN = (386, 770, 1026, 1024)


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class _Deconv(nn.Module):
    features: int
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(k=4, s=2, p=1) doubles the resolution;
        # flax's equivalent size arithmetic is padding='SAME' here.
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding='SAME', use_bias=False,
                             dtype=self.dtype, name='conv')(x)
        return _leaky(x) if self.act else x


class FlowNetSimple(nn.Module):
    """Input: (N, H, W, 6) stacked image pair normalized to the flownet
    statistics; output: (N, H', W', 2) flow at 1/4 the input resolution
    upsampled back to input scale (flownet_simple.py:201-251)."""
    flow_scale_factor: float = 5.0
    img_scale_factor: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv_outs = []
        for i in range(6):
            planes = 2 * _CONV_IN[i] if i == 5 else _CONV_IN[i + 1]
            k = _CONV_K[i]
            x = nn.Conv(planes, (k, k), strides=(2, 2),
                        padding=[(k // 2, k // 2)] * 2, use_bias=True,
                        dtype=self.dtype, name=f'conv{i + 1}_0')(x)
            x = _leaky(x)
            for j in range(1, _CONV_N[i]):
                kk = 3 if i == 2 else k
                x = nn.Conv(planes, (kk, kk),
                            padding=[(kk // 2, kk // 2)] * 2, use_bias=True,
                            dtype=self.dtype, name=f'conv{i + 1}_{j}')(x)
                x = _leaky(x)
            if i >= 1:                       # out_indices (2..6)
                conv_outs.append(x)

        planes_list = [512, 256, 128, 64]
        concat = conv_outs[-1]
        for step, i in enumerate(range(len(conv_outs) - 1, 0, -1)):
            flow = nn.Conv(2, (3, 3), padding=1, use_bias=False,
                           dtype=self.dtype,
                           name=f'predict_flow{i + 2}')(concat)
            upflow = _Deconv(2, act=False, dtype=self.dtype,
                             name=f'upsample_flow{i + 1}')(flow)
            deconv = _Deconv(planes_list[step], dtype=self.dtype,
                             name=f'deconv{i + 1}')(concat)
            tgt = conv_outs[i - 1]
            upflow = upflow[:, :tgt.shape[1], :tgt.shape[2], :]
            deconv = deconv[:, :tgt.shape[1], :tgt.shape[2], :]
            concat = jnp.concatenate([tgt, deconv, upflow], axis=-1)

        flow = nn.Conv(2, (3, 3), padding=1, use_bias=False,
                       dtype=self.dtype, name='predict_flow')(concat)
        scale = 4.0 / self.img_scale_factor
        n, h, w, _ = flow.shape
        flow = jax.image.resize(flow, (n, int(h * scale), int(w * scale), 2),
                                'bilinear')
        return flow * scale * self.flow_scale_factor


def prepare_flow_input(img_a: jnp.ndarray, img_b: jnp.ndarray,
                       img_scale_factor: float = 0.5) -> jnp.ndarray:
    """Stack and normalize an image pair for FlowNetSimple
    (flownet_simple.py:151-199): inputs are raw RGB in [0, 255]; flownet
    wants /255 minus its own channel means, downscaled."""
    mean = jnp.asarray([0.411, 0.432, 0.450])
    pair = jnp.concatenate([img_a, img_b], axis=-1) / 255.0 \
        - jnp.tile(mean, 2)
    n, h, w, c = pair.shape
    return jax.image.resize(
        pair, (n, int(h * img_scale_factor), int(w * img_scale_factor), c),
        'bilinear')


def flow_warp_feats(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp features ``x`` (N, H, W, C) by ``flow`` (N, Hf, Wf, 2 [dx, dy])
    — flow.py:5-44: resize flow to the feature grid, scale the components
    by the resolution ratio, then border-padded align_corners=True
    bilinear sampling."""
    n, h, w, c = x.shape
    sf_w = w / flow.shape[2]
    sf_h = h / flow.shape[1]
    flow = jax.image.resize(flow, (n, h, w, 2), 'bilinear')
    fx = flow[..., 0] * sf_w
    fy = flow[..., 1] * sf_h
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    sx = jnp.clip(gx[None] + fx, 0, w - 1)   # border padding
    sy = jnp.clip(gy[None] + fy, 0, h - 1)

    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = sx - x0
    wy = sy - y0

    def gather(xs, ys):
        idx = ys * w + xs                       # (N, H, W)
        flat = x.reshape(n, h * w, c)
        return jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1) \
            .reshape(n, h, w, c)

    v00 = gather(x0, y0)
    v01 = gather(x1, y0)
    v10 = gather(x0, y1)
    v11 = gather(x1, y1)
    wx_ = wx[..., None]
    wy_ = wy[..., None]
    return (v00 * (1 - wx_) * (1 - wy_) + v01 * wx_ * (1 - wy_)
            + v10 * (1 - wx_) * wy_ + v11 * wx_ * wy_)
