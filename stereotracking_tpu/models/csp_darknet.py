"""CSPDarknet-P5 backbones, single- and dual-branch (RGB + disparity).

Topology re-created from the reference descriptions
(/root/reference/mmtrack/models/backbones/csp_darknet_disparity_v1.py:66-206
and csp_darknet_disparity_v0.py): a Focus stem, four conv+CSP stages (SPPF in
the last), with the V1 variant adding a parallel ``disp_stem``+``disp_stage1``
whose stride-4 output is averaged with the RGB branch before the shared
stages.  Written NHWC in Flax; all shapes static.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvBNAct, CSPLayer, Focus, SPPFBottleneck, make_round,
                     space_to_depth, widen)


def _use_s2d(x, train: bool) -> bool:
    """Use the space-to-depth stem/stage1 evaluation when shapes allow.

    The s2d form is mathematically identical (exact kernel remap, same
    parameters) but ~8x faster on TPU at 1080p because the low-channel
    high-resolution convs stop padding their 3/32-channel minor dims to the
    128-lane tile. Train mode keeps the canonical form: BN batch statistics
    match either way, but the canonical path keeps gradients simplest.
    """
    return (not train) and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0

# P5 arch table: in_ch, out_ch, num_blocks, add_identity, use_spp
P5_ARCH = [
    (64, 128, 3, True, False),
    (128, 256, 9, True, False),
    (256, 512, 9, True, False),
    (512, 1024, 3, False, True),
]


class _Stage(nn.Module):
    """One backbone stage: stride-2 conv [+ SPPF] + CSP layer."""
    out_channels: int
    num_blocks: int
    add_identity: bool
    use_spp: bool
    spp_kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32
    quant: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, s2d_in: bool = False,
                 fold_out: bool = False, fold_in: bool = False):
        """``s2d_in``: first conv consumes s2d(2) input. ``fold_out``:
        with s2d_in, emit the whole stage W-folded (CSP runs folded —
        the 32/64-channel intermediates fill the 128-lane tile).
        ``fold_in``: first conv consumes a W-folded input (standard
        output)."""
        if fold_out:
            assert not self.use_spp
            mode = 's2d2_in_fold_out' if s2d_in else 'fold_through'
            x = ConvBNAct(self.out_channels, 3, strides=2,
                          dtype=self.dtype, quant=self.quant, name='conv')(
                              x, train, conv_mode=mode)
            return CSPLayer(self.out_channels, self.num_blocks,
                            self.add_identity, dtype=self.dtype,
                            quant=self.quant,
                            name='csp')(x, train, fold=True)
        mode = 's2d2_in' if s2d_in else (
            'fold_consume' if fold_in else None)
        x = ConvBNAct(self.out_channels, 3, strides=2, dtype=self.dtype,
                      quant=self.quant, name='conv')(x, train,
                                                     conv_mode=mode)
        if self.use_spp:
            x = SPPFBottleneck(self.out_channels, self.spp_kernel_sizes,
                               dtype=self.dtype, quant=self.quant,
                               name='spp')(x, train)
        x = CSPLayer(self.out_channels, self.num_blocks, self.add_identity,
                     dtype=self.dtype, quant=self.quant,
                     name='csp')(x, train)
        return x


class CSPDarknet(nn.Module):
    """Single-branch YOLOX CSPDarknet-P5 (monocular config path).

    ``norm_eval=True`` keeps BatchNorm in running-stats mode during
    training (reference BaseBackbone norm_eval semantics); stage freezing
    is expressed as an optimizer mask via ``frozen_stage_paths``."""
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    out_indices: Sequence[int] = (2, 3, 4)
    spp_kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    norm_eval: bool = False
    dtype: Any = jnp.float32
    quant: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, dict):
            x = x['img']
        train = train and not self.norm_eval
        q = None if train else self.quant   # int8 is an inference mode
        s2d = _use_s2d(x, train) and 0 not in self.out_indices
        outs = []
        x = Focus(widen(64, self.widen_factor), dtype=self.dtype,
                  name='stem')(space_to_depth(x, 4) if s2d else x,
                               train, s2d=s2d)
        if 0 in self.out_indices:
            outs.append(x)
        fold = s2d and 1 not in self.out_indices
        for i, (_, out_ch, n, ident, spp) in enumerate(P5_ARCH):
            x = _Stage(widen(out_ch, self.widen_factor),
                       make_round(n, self.deepen_factor), ident, spp,
                       self.spp_kernel_sizes, dtype=self.dtype, quant=q,
                       name=f'stage{i + 1}')(x, train,
                                             s2d_in=s2d and i == 0,
                                             fold_out=fold and i == 0,
                                             fold_in=fold and i == 1)
            if i + 1 in self.out_indices:
                outs.append(x)
        return tuple(outs)


class CSPDarknetDual(nn.Module):
    """Two-branch CSPDarknet: separate stem+stage1 for RGB and disparity,
    fused by averaging at stride 4, then shared stages 2-4.

    Behavior of YOLOXCSPDarknet_Disparity_V1_MMYOLO.forward
    (csp_darknet_disparity_v1.py:155-206). ``out_fd=True`` appends the
    disparity stage-1 features (the completion-head tap).
    """
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    out_indices: Sequence[int] = (2, 3, 4)
    out_fd: bool = False
    spp_kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    norm_eval: bool = False
    dtype: Any = jnp.float32
    quant: Any = None

    @nn.compact
    def __call__(self, x: dict, train: bool = False):
        train = train and not self.norm_eval
        q = None if train else self.quant   # int8 is an inference mode
        wf, df = self.widen_factor, self.deepen_factor
        outs = []
        if 'stage3_out' in x:
            # stages 1-3 evaluated by the fused pallas kernels
            # (ops/stage{1,2}_pallas.py: pallas_stage3_out reuses the
            # generic stage-2 kernel on the stage3 subtree); 'stage2_out'
            # rides along for the neck's C3 tap.  Stage 4 resumes on the
            # folded stage-3 tensor (fold_consume entry conv).
            assert tuple(self.out_indices) == (2, 3, 4) and not self.out_fd
            from ..ops.stage2_pallas import unfold_w
            outs.append(unfold_w(x['stage2_out'][None].astype(self.dtype)))
            y = x['stage3_out'][None].astype(self.dtype)
            outs.append(unfold_w(y))
            _, out_ch, n, ident, spp = P5_ARCH[3]
            y = _Stage(widen(out_ch, wf), make_round(n, df), ident, spp,
                       self.spp_kernel_sizes, dtype=self.dtype, quant=q,
                       name='stage4')(y, train, fold_in=True)
            outs.append(y)
            return tuple(outs)
        if 'stage2_out' in x:
            # stages 1 AND 2 were evaluated by the fused pallas kernels
            # (ops/stage1_pallas.py + ops/stage2_pallas.py) from the SAME
            # canonical parameters; the stage-2 activations arrive W-folded.
            # The C3 neck tap unfolds with one reshape; stage 3 consumes the
            # folded tensor directly (fold_consume entry conv).  Init must
            # use raw inputs so the parameter tree stays complete.
            assert tuple(self.out_indices) == (2, 3, 4) and not self.out_fd
            from ..ops.stage2_pallas import unfold_w
            y = x['stage2_out'][None].astype(self.dtype)
            outs.append(unfold_w(y))
            for i in range(2, 4):
                _, out_ch, n, ident, spp = P5_ARCH[i]
                y = _Stage(widen(out_ch, wf), make_round(n, df), ident, spp,
                           self.spp_kernel_sizes, dtype=self.dtype, quant=q,
                           name=f'stage{i + 1}')(y, train, fold_in=i == 2)
                outs.append(y)
            return tuple(outs)
        if 'stage1_out' in x:
            # the whole dual stage 1 (both stems' stage-1 + average) was
            # evaluated by the fused pallas kernel (ops/stage1_pallas.py)
            # from the SAME canonical parameters; resume at stage 2 in the
            # W-folded layout.  Init must use raw inputs so the parameter
            # tree stays complete.
            assert 1 not in self.out_indices and not self.out_fd
            y = x['stage1_out'][None].astype(self.dtype)
            for i in range(1, 4):
                _, out_ch, n, ident, spp = P5_ARCH[i]
                y = _Stage(widen(out_ch, wf), make_round(n, df), ident, spp,
                           self.spp_kernel_sizes, dtype=self.dtype, quant=q,
                           name=f'stage{i + 1}')(y, train, fold_in=i == 1)
                if i + 1 in self.out_indices:
                    outs.append(y)
            return tuple(outs)
        if 'stem_out' in x:
            # stem activations precomputed by the pallas Focus kernel
            # (ops/stem_pallas.py) from host-packed frames — already in the
            # s2d(2) layout the folded stage-1 path consumes. The stem
            # parameters still live in this module's canonical tree (the
            # pallas path reads them via pallas_stem_outputs); init must use
            # raw inputs so the tree is complete.
            o_rgb = x['stem_out'][None].astype(self.dtype)
            o_disp = x['disp_stem_out'][None].astype(self.dtype)
            s2d = True
        else:
            img = x['img']
            disp = x['disp_postp']
            s2d = _use_s2d(img, train)
            o_rgb = Focus(widen(64, wf), dtype=self.dtype, name='stem')(
                space_to_depth(img, 4) if s2d else img, train, s2d=s2d)
            o_disp = Focus(widen(64, wf), dtype=self.dtype,
                           name='disp_stem')(
                space_to_depth(disp, 4) if s2d else disp, train, s2d=s2d)

        s1 = P5_ARCH[0]
        fold = s2d and 1 not in self.out_indices and not self.out_fd
        o_rgb = _Stage(widen(s1[1], wf), make_round(s1[2], df), s1[3], s1[4],
                       self.spp_kernel_sizes, dtype=self.dtype, quant=q,
                       name='stage1')(o_rgb, train, s2d_in=s2d,
                                      fold_out=fold)
        o_disp = _Stage(widen(s1[1], wf), make_round(s1[2], df), s1[3], s1[4],
                        self.spp_kernel_sizes, dtype=self.dtype, quant=q,
                        name='disp_stage1')(o_disp, train, s2d_in=s2d,
                                            fold_out=fold)

        y = (o_rgb + o_disp) / 2.0
        if 1 in self.out_indices:
            outs.append(y)

        # stage 2 consumes the folded tensor back to standard layout
        # (folding stage 2's CSP as well was measured perf-neutral at
        # 1080p: its (136, 240) maps are no longer HBM-bound)
        for i in range(1, 4):
            _, out_ch, n, ident, spp = P5_ARCH[i]
            y = _Stage(widen(out_ch, wf), make_round(n, df), ident, spp,
                       self.spp_kernel_sizes, dtype=self.dtype, quant=q,
                       name=f'stage{i + 1}')(y, train,
                                             fold_in=fold and i == 1)
            if i + 1 in self.out_indices:
                outs.append(y)

        if self.out_fd:
            outs.append(o_disp)
        return tuple(outs)


class CSPDarknetConcat(nn.Module):
    """V0 variant: RGB and disparity concatenated to a 6-channel input with a
    single stem (csp_darknet_disparity_v0.py:17-140)."""
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    out_indices: Sequence[int] = (2, 3, 4)
    spp_kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32
    quant: Any = None

    @nn.compact
    def __call__(self, x: dict, train: bool = False):
        img = jnp.concatenate([x['img'], x['disp_postp']], axis=-1)
        return CSPDarknet(self.deepen_factor, self.widen_factor,
                          self.out_indices, self.spp_kernel_sizes,
                          dtype=self.dtype, quant=self.quant,
                          name='trunk')(img, train)


def frozen_stage_paths(frozen_stages: int, dual: bool = False):
    """Parameter-path prefixes to freeze for ``frozen_stages`` (reference
    BaseBackbone_Disparity_MMYOLO._freeze_stages semantics: stage 0 = the
    stem(s), i = stage i). Apply as an optax.masked / multi_transform
    mask over the optimizer update."""
    prefixes = []
    if frozen_stages >= 0:
        prefixes.append('stem')
        if dual:
            prefixes.append('disp_stem')
    for i in range(1, frozen_stages + 1):
        prefixes.append(f'stage{i}')
        if dual and i == 1:
            prefixes.append('disp_stage1')
    return tuple(prefixes)
