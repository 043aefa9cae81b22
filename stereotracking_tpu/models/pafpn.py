"""YOLOX PAFPN neck (top-down + bottom-up path aggregation), NHWC Flax.

Re-creates the behavior of mmdet YOLOXPAFPN as configured by the reference
(/root/reference/configs/_base_/yolox_s_8x8_mmyolo.py:30-37): in_channels
[256, 512, 1024] x widen_factor, out 256 x widen_factor, nearest upsampling,
CSP blocks with num_blocks = round(3 * deepen_factor), no identity.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNAct, CSPLayer, make_round, widen


def _upsample_nearest_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class YOLOXPAFPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024)  # pre-widen table
    out_channels: int = 256
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    dtype: Any = jnp.float32
    quant: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        q = None if train else self.quant   # int8 is an inference mode
        wf = self.widen_factor
        chans = [widen(c, wf) for c in self.in_channels]
        num_csp = make_round(3, self.deepen_factor)
        n_levels = len(chans)

        # top-down
        inner_outs = [feats[-1]]
        for idx in range(n_levels - 1, 0, -1):
            feat_high = inner_outs[0]
            feat_low = feats[idx - 1]
            feat_high = ConvBNAct(
                chans[idx - 1], 1, dtype=self.dtype, quant=q,
                name=f'reduce_{n_levels - 1 - idx}')(feat_high, train)
            inner_outs[0] = feat_high
            up = _upsample_nearest_2x(feat_high)
            inner = CSPLayer(
                chans[idx - 1], num_csp, add_identity=False, dtype=self.dtype,
                quant=q, name=f'top_down_{n_levels - 1 - idx}')(
                    jnp.concatenate([up, feat_low], axis=-1), train)
            inner_outs.insert(0, inner)

        # bottom-up
        outs = [inner_outs[0]]
        for idx in range(n_levels - 1):
            feat_low = ConvBNAct(
                chans[idx], 3, strides=2, dtype=self.dtype, quant=q,
                name=f'downsample_{idx}')(outs[-1], train)
            out = CSPLayer(
                chans[idx + 1], num_csp, add_identity=False, dtype=self.dtype,
                quant=q, name=f'bottom_up_{idx}')(
                    jnp.concatenate([feat_low, inner_outs[idx + 1]], axis=-1),
                    train)
            outs.append(out)

        # output projections
        out_ch = widen(self.out_channels, wf)
        return tuple(
            ConvBNAct(out_ch, 1, dtype=self.dtype, quant=q,
                      name=f'out_{i}')(o, train)
            for i, o in enumerate(outs))
