"""SiamRPN++-style ResNet-50 backbone (SOTResNet), Flax / NHWC.

Re-creates the behavior of the reference's ``SOTResNet``
(/root/reference/mmtrack/models/backbones/sot_resnet.py): a torchvision
ResNet-50 with the SiamRPN++ spatial-alignment modifications —

* stem: 7x7 stride-2 conv with NO padding (sot_resnet.py:205-241), then
  3x3 stride-2 max-pool with padding 1;
* bottleneck conv2 padding ``2 - stride`` (stride-2 blocks crop instead of
  pad, sot_resnet.py:65-70); with dilation the first block of a stage
  halves the dilation and pads accordingly;
* stage downsample: 1x1 for plain blocks, 3x3 (pad 0 / dilation//2) for
  strided or dilated stages (sot_resnet.py:284-307);
* canonical SiamRPN++ hyperparameters: strides (1, 2, 1, 1), dilations
  (1, 1, 2, 4), out_indices (1, 2, 3) -> stage-2/3/4 features, all at
  stride 8 spatially.

TPU notes: NHWC layout; BN always uses running stats at ``norm_eval``
(the reference trains with the backbone partly frozen + norm_eval=True);
``frozen_stages`` is honored by the train loop via parameter filtering
(mask in ``frozen_param_paths``), not by in-graph mutation.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..resnet import (EXPANSION, RESNET50_BLOCKS,  # noqa: F401
                      STAGE_PLANES, Bottleneck, ConvBN, ResNet,
                      frozen_param_paths)

_ConvBN = ConvBN


class SOTBottleneck(nn.Module):
    """Bottleneck with the SiamRPN++ padding rules (sot_resnet.py:65-70,
    86-92: pytorch style — the stride sits on conv2)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = 2 - self.stride
        dilation = self.dilation
        if dilation > 1:
            padding = dilation
            if self.has_downsample:
                dilation = dilation // 2
                padding = dilation

        out = _ConvBN(self.planes, 1, dtype=self.dtype, name='conv1')(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.planes, 3, stride=self.stride, dilation=dilation,
                      padding=padding, dtype=self.dtype, name='conv2')(
                          out, train)
        out = nn.relu(out)
        out = _ConvBN(self.planes * EXPANSION, 1, dtype=self.dtype,
                      name='conv3')(out, train)

        if self.has_downsample:
            # SOTResLayer downsample (sot_resnet.py:284-307)
            if self.stride == 1 and self.dilation == 1:
                k, dd, pad = 1, 1, 0
            else:
                k = 3
                dd = self.dilation // 2 if self.dilation > 1 else 1
                pad = dd if self.dilation > 1 else 0
            identity = _ConvBN(self.planes * EXPANSION, k, stride=self.stride,
                               dilation=dd, padding=pad, dtype=self.dtype,
                               name='downsample')(x, train)
        else:
            identity = x
        return nn.relu(out + identity)


class SOTResNet(nn.Module):
    """ResNet-50 with SiamRPN++ modifications; returns the features of
    ``out_indices`` stages (1-based stage index as in mmdet)."""
    depth: int = 50
    strides: Tuple[int, ...] = (1, 2, 1, 1)
    dilations: Tuple[int, ...] = (1, 1, 2, 4)
    out_indices: Sequence[int] = (1, 2, 3)
    frozen_stages: int = 4
    norm_eval: bool = True
    # tiny-config knobs (test-gate variants; None/64 = canonical r50)
    stage_blocks: Tuple[int, ...] = None
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.depth == 50, 'Only r50 is supported for SOT.'
        bn_train = train and not self.norm_eval
        blocks_per_stage = self.stage_blocks or RESNET50_BLOCKS
        widths = tuple(p * self.base_width // 64 for p in STAGE_PLANES)
        x = _ConvBN(self.base_width, 7, stride=2, padding=0,
                    dtype=self.dtype, name='conv1')(x, bn_train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        for si, (planes, blocks) in enumerate(zip(widths,
                                                  blocks_per_stage)):
            stride, dilation = self.strides[si], self.dilations[si]
            in_ch = x.shape[-1]
            for bi in range(blocks):
                has_ds = bi == 0 and (stride != 1
                                      or in_ch != planes * EXPANSION)
                x = SOTBottleneck(planes, stride if bi == 0 else 1, dilation,
                                  has_downsample=has_ds, dtype=self.dtype,
                                  name=f'layer{si + 1}_{bi}')(x, bn_train)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)


