"""Standard ResNet-50 backbone (Flax / NHWC), shared by the Stark SOT
model and the VID / VIS / MOT-extras families.

Behavior matches mmdet's ResNet (torchvision weights layout): 7x7 stride-2
pad-3 stem, 3x3 stride-2 pad-1 max-pool, four bottleneck stages with the
stride on conv2 ("pytorch" style). ``norm_eval=True`` keeps BN in
running-stats mode during training (the reference default for detection
backbones); ``frozen_param_paths`` gives the optimizer-mask analog of
``frozen_stages``.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

RESNET50_BLOCKS = (3, 4, 6, 3)
STAGE_PLANES = (64, 128, 256, 512)
EXPANSION = 4


class ConvBN(nn.Module):
    """Conv (no bias) + BN, the mmcv build_conv_layer/build_norm_layer pair."""
    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=[(self.padding, self.padding)] * 2,
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name='bn')(x)


_ConvBN = ConvBN

class Bottleneck(nn.Module):
    """Standard torchvision/mmdet ResNet bottleneck (pytorch style: stride
    on conv2, SAME-style padding = dilation)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = _ConvBN(self.planes, 1, dtype=self.dtype, name='conv1')(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.planes, 3, stride=self.stride,
                      dilation=self.dilation, padding=self.dilation,
                      dtype=self.dtype, name='conv2')(out, train)
        out = nn.relu(out)
        out = _ConvBN(self.planes * EXPANSION, 1, dtype=self.dtype,
                      name='conv3')(out, train)
        if self.has_downsample:
            identity = _ConvBN(self.planes * EXPANSION, 1,
                               stride=self.stride, dtype=self.dtype,
                               name='downsample')(x, train)
        else:
            identity = x
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Standard ResNet-50 (mmdet semantics: 7x7/2 pad-3 stem, 3x3/2 pad-1
    max-pool, four bottleneck stages). Used by the Stark / VID / VIS / MOT
    model families; ``out_indices`` are 0-based stage indices."""
    depth: int = 50
    num_stages: int = 4
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (3,)
    norm_eval: bool = True
    # tiny-config knobs (test-gate variants; None = canonical r50)
    stage_blocks: Tuple[int, ...] = None
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.depth == 50, 'Only r50 is implemented.'
        bn_train = train and not self.norm_eval
        blocks_per_stage = self.stage_blocks or RESNET50_BLOCKS
        widths = tuple(p * self.base_width // 64 for p in STAGE_PLANES)
        x = _ConvBN(self.base_width, 7, stride=2, padding=3,
                    dtype=self.dtype, name='conv1')(x, bn_train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        for si, (planes, blocks) in enumerate(
                zip(widths[:self.num_stages],
                    blocks_per_stage[:self.num_stages])):
            stride, dilation = self.strides[si], self.dilations[si]
            in_ch = x.shape[-1]
            for bi in range(blocks):
                has_ds = bi == 0 and (stride != 1
                                      or in_ch != planes * EXPANSION)
                x = Bottleneck(planes, stride if bi == 0 else 1, dilation,
                               has_downsample=has_ds, dtype=self.dtype,
                               name=f'layer{si + 1}_{bi}')(x, bn_train)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)


def frozen_param_paths(frozen_stages: int):
    """Parameter-path prefixes frozen for a given ``frozen_stages`` value
    (reference ResNet._freeze_stages semantics; applied by masking the
    optimizer update, the functional analog of requires_grad=False)."""
    prefixes = []
    if frozen_stages >= 0:
        prefixes.append('conv1')
    for i in range(1, frozen_stages + 1):
        prefixes.append(f'layer{i}_')
    return tuple(prefixes)
