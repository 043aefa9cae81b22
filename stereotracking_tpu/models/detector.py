"""YOLOX detector assembly: backbone + PAFPN + head + fused postprocess.

The reference's ``YOLODetector_Disparity_V1`` (detector config:
/root/reference/configs/stereo_tracking/ocsort/yolox_s_mmyolo_mot_airdrone_disp.py:37-47)
becomes a single Flax module whose ``predict`` path — decode, score filter,
class-aware NMS, rescale — is one jitted function (the reference bounces
through mmcv CUDA NMS here; SURVEY.md section 2.9).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nms import NMSResult, batched_nms, multiclass_candidates
from .csp_darknet import CSPDarknet, CSPDarknetConcat, CSPDarknetDual
from .pafpn import YOLOXPAFPN
from .yolox_head import YOLOXHeadModule, decode_predictions


class DetectorConfig(NamedTuple):
    """Static detector hyperparameters (YOLOX-S canonical values)."""
    num_classes: int = 1
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    strides: Tuple[int, ...] = (8, 16, 32)
    backbone: str = 'dual'          # 'dual' | 'single' | 'concat'
    # test_cfg (config :42 overriding _base_: score 0.01, nms 0.5, top 300)
    score_thr: float = 0.01
    nms_iou_thr: float = 0.5
    max_per_img: int = 300
    pre_nms_top_k: int = 2048
    # quantized inference for backbone stages + neck convs (None | 'int8' |
    # 'sim8'); the head stays in the compute dtype (regression-sensitive),
    # as do the stems (they read 0-255 raw pixels). Inference-only: train
    # mode always evaluates the canonical convs.
    quant: Any = None


class YOLOXDetector(nn.Module):
    """Backbone (+disparity branch) -> PAFPN -> decoupled head."""
    cfg: DetectorConfig = DetectorConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        cfg = self.cfg
        if cfg.backbone == 'dual':
            bb = CSPDarknetDual(cfg.deepen_factor, cfg.widen_factor,
                                dtype=self.dtype, quant=cfg.quant,
                                name='backbone')
        elif cfg.backbone == 'concat':
            bb = CSPDarknetConcat(cfg.deepen_factor, cfg.widen_factor,
                                  dtype=self.dtype, quant=cfg.quant,
                                  name='backbone')
        else:
            bb = CSPDarknet(cfg.deepen_factor, cfg.widen_factor,
                            dtype=self.dtype, quant=cfg.quant,
                            name='backbone')
        feats = bb(inputs, train)
        feats = YOLOXPAFPN(
            deepen_factor=cfg.deepen_factor, widen_factor=cfg.widen_factor,
            dtype=self.dtype, quant=cfg.quant, name='neck')(feats, train)
        return YOLOXHeadModule(
            num_classes=cfg.num_classes, widen_factor=cfg.widen_factor,
            strides=cfg.strides, dtype=self.dtype,
            name='bbox_head')(feats, train)


def detector_predict(variables, module: YOLOXDetector, inputs: dict,
                     scale_factor: Tuple[float, float] = (1.0, 1.0),
                     stage1_backend: str = 'xla',
                     stage2_backend: str = 'xla',
                     stage3_backend: str = 'xla',
                     ) -> NMSResult:
    """Single-image predict: forward + decode + NMS + rescale.

    ``scale_factor`` is (sf_x, sf_y) of the resize applied by the pipeline;
    boxes are divided by it to return to original-image coordinates
    (mmdet ``rescale=True`` semantics).
    """
    cfg = module.cfg
    if cfg.quant is not None:
        # quantized inference lives in the XLA stage/neck modules; the fused
        # pallas stage kernels compute bf16 from canonical params and would
        # silently bypass quant (ADVICE r4) — resume the XLA path at stage 1
        # so BENCH_QUANT / int8 configs measure what they claim.
        stage1_backend = stage2_backend = stage3_backend = 'xla'
    if 'img_stem_pack' in inputs:
        # host-packed frames: evaluate the Focus stems with the pallas
        # kernel (ops/stem_pallas.py) and hand the s2d(2)-layout
        # activations to the backbone (same canonical parameters)
        from ..ops.stem_pallas import pallas_stem_outputs
        wout = inputs['disp_postp'].shape[2] // 4
        interp = jax.default_backend() != 'tpu'
        so, dso = pallas_stem_outputs(
            variables['params']['backbone'],
            variables['batch_stats']['backbone'],
            inputs['img_stem_pack'], inputs['disp_stem_pack'], wout,
            interpret=interp)
        if stage1_backend == 'pallas':
            # fused dual stage 1 (ops/stage1_pallas.py): stems' s2d(2)
            # activations -> W-folded stage-1 output, whole CSP chain in
            # VMEM; the backbone resumes at stage 2 (fold_in)
            from ..ops.stage1_pallas import pallas_stage1_out
            y1 = pallas_stage1_out(
                variables['params']['backbone'],
                variables['batch_stats']['backbone'], so, dso,
                interpret=interp)
            if stage2_backend == 'pallas':
                # fused stage 2 (ops/stage2_pallas.py): entry conv + CSP
                # chain in VMEM on the W-folded grid; the backbone resumes
                # at stage 3 (fold_consume)
                from ..ops.stage2_pallas import (pallas_stage2_out,
                                                pallas_stage3_out)
                y2 = pallas_stage2_out(
                    variables['params']['backbone'],
                    variables['batch_stats']['backbone'], y1,
                    interpret=interp)
                if stage3_backend == 'pallas':
                    # fused stage 3: the SAME generic kernel on the stage3
                    # subtree; stage 4 resumes on the folded tensor and
                    # 'stage2_out' rides along for the neck's C3 tap
                    y3 = pallas_stage3_out(
                        variables['params']['backbone'],
                        variables['batch_stats']['backbone'], y2,
                        interpret=interp)
                    inputs = {**inputs, 'stage2_out': y2, 'stage3_out': y3}
                else:
                    inputs = {**inputs, 'stage2_out': y2}
            else:
                inputs = {**inputs, 'stage1_out': y1}
        else:
            inputs = {**inputs, 'stem_out': so, 'disp_stem_out': dso}
    cls, reg, obj = module.apply(variables, inputs, train=False)
    boxes, scores = decode_predictions(cls, reg, obj, cfg.strides)
    boxes, scores = boxes[0], scores[0]          # batch of 1
    fb, fs, fl = multiclass_candidates(boxes, scores, cfg.score_thr)
    res = batched_nms(fb, fs, fl, cfg.nms_iou_thr, cfg.score_thr,
                      cfg.pre_nms_top_k, cfg.max_per_img)
    sf = jnp.asarray([scale_factor[0], scale_factor[1],
                      scale_factor[0], scale_factor[1]], jnp.float32)
    return res._replace(boxes=res.boxes / sf)
