"""Flax building blocks for the YOLOX family, NHWC / TPU-first.

These re-create the *behavior* of the torch blocks the reference composes
(mmdet ``Focus``/``CSPLayer``, mmyolo ``SPPFBottleneck``, mmcv ``ConvModule``;
see /root/reference/mmtrack/models/backbones/csp_darknet_disparity_v1.py) as
idiomatic Flax modules: NHWC layout so convs tile directly onto the MXU,
parameters float32 with a configurable compute dtype (bfloat16 by default on
TPU), BatchNorm with the YOLOX momentum/eps.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# torch BN(momentum=0.03) == flax BN(momentum=0.97); eps matches.
BN_MOMENTUM = 0.97
BN_EPS = 0.001


def widen(channels: int, widen_factor: float, divisor: int = 8) -> int:
    """Channel widening identical to mmyolo.make_divisible (ceil to /8)."""
    import math
    return math.ceil(channels * widen_factor / divisor) * divisor


def make_round(x: float, deepen_factor: float) -> int:
    """Block-count deepening identical to mmyolo.make_round."""
    return max(round(x * deepen_factor), 1) if x > 1 else int(x)


class ConvBNAct(nn.Module):
    """Conv2D (no bias) + BatchNorm + SiLU: the mmcv ConvModule used all over
    YOLOX."""
    out_channels: int
    kernel_size: int = 1
    strides: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    act: Callable = nn.silu

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(self.kernel_size // 2, self.kernel_size // 2)] * 2,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name='conv')(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name='bn')(x)
        return self.act(x)


class Focus(nn.Module):
    """Pixel-unshuffle stem: 2x2 space-to-depth then 3x3 ConvBNAct.

    Channel ordering of the four shifted slices matches torch mmdet ``Focus``
    (csp_darknet.py upstream): [y-even/x-even, y-odd/x-even, y-even/x-odd,
    y-odd/x-odd] so converted torch weights drop in unchanged.
    """
    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, H, W, C)
        patch_tl = x[:, 0::2, 0::2, :]
        patch_bl = x[:, 1::2, 0::2, :]
        patch_tr = x[:, 0::2, 1::2, :]
        patch_br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([patch_tl, patch_bl, patch_tr, patch_br], axis=-1)
        return ConvBNAct(self.out_channels, self.kernel_size,
                         dtype=self.dtype, name='conv')(x, train)


class DarknetBottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual (mmdet DarknetBottleneck,
    expansion=1.0 as used inside CSPLayer)."""
    out_channels: int
    add_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.out_channels
        out = ConvBNAct(hidden, 1, dtype=self.dtype, name='conv1')(x, train)
        out = ConvBNAct(self.out_channels, 3, dtype=self.dtype,
                        name='conv2')(out, train)
        if self.add_identity:
            out = out + x
        return out


class CSPLayer(nn.Module):
    """Cross-stage-partial block (mmdet CSPLayer, expand_ratio=0.5)."""
    out_channels: int
    num_blocks: int = 1
    add_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 2
        main = ConvBNAct(mid, 1, dtype=self.dtype, name='main_conv')(x, train)
        short = ConvBNAct(mid, 1, dtype=self.dtype, name='short_conv')(x, train)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(
                mid, self.add_identity, dtype=self.dtype,
                name=f'blocks_{i}')(main, train)
        x = jnp.concatenate([main, short], axis=-1)
        return ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                         name='final_conv')(x, train)


def _maxpool_same(x, k: int):
    return nn.max_pool(
        x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2)


class SPPFBottleneck(nn.Module):
    """Spatial pyramid pooling (mmyolo SPPFBottleneck with tuple
    kernel_sizes: parallel max-pools, classic SPP form)."""
    out_channels: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        x = ConvBNAct(mid, 1, dtype=self.dtype, name='conv1')(x, train)
        pools = [x] + [_maxpool_same(x, k) for k in self.kernel_sizes]
        x = jnp.concatenate(pools, axis=-1)
        return ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                         name='conv2')(x, train)
