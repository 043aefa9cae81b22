"""Disparity-completion training step (research track).

Capability of the reference's completion flow: ``OCSORT_Disparity.
parse_train_input`` builds ``disp_cutout`` (sparse disparity with random
patches removed, mot/ocsort_disparity.py:204-209); the multi-task model
predicts dense disparity from it; BerHu loss against the GT map on valid
pixels; ``ResetLRHook`` (engine/hooks/reset_lr_hook.py:13-69) switches to
this stage by resetting the LR, freezing detection (train_bbox=False) and
enabling the disparity head (train_disp=True).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.disp_completion import YOLOXDisp, berhu_loss
from ..models.yolox_head import decode_predictions, level_priors
from .losses import YOLOXLossConfig, yolox_loss


class CompletionConfig(NamedTuple):
    train_bbox: bool = False       # ResetLRHook stage: detection frozen
    train_disp: bool = True
    disp_loss_weight: float = 1.0
    cut_patch: int = 32
    cut_ratio: float = 0.4


def make_disp_cutout(disp_postp: jnp.ndarray, disp_mask: jnp.ndarray,
                     cut_mask: jnp.ndarray) -> jnp.ndarray:
    """disp_cutout: disparity zeroed where valid AND cut
    (parse_train_input semantics: mask sum >= 2 -> zero)."""
    zero = (disp_mask > 0) & (cut_mask > 0)
    return jnp.where(zero, 0.0, disp_postp)


def completion_loss_fn(params, batch_stats, module: YOLOXDisp, batch: dict,
                       loss_cfg: YOLOXLossConfig, cfg: CompletionConfig):
    """Joint (masked) detection + completion loss.

    ``batch`` adds 'disp_cut_mask' (N, H, W, 1) and uses the cutout
    disparity as the network's disparity input while supervising against
    the full map on valid pixels.
    """
    cutout = make_disp_cutout(batch['disp_postp'], batch['disp_mask'],
                              batch['disp_cut_mask'])
    inputs = {'img': batch['img'], 'disp_postp': cutout,
              'disp_mask': batch['disp_mask']}
    ((cls, reg, obj), disp_pred), mutated = module.apply(
        {'params': params, 'batch_stats': batch_stats}, inputs,
        train=True, mutable=['batch_stats'])

    losses = {}
    total = 0.0
    if cfg.train_disp:
        # supervise at prediction resolution (stride 2): nearest-downsample
        # GT + mask
        s = batch['disp_postp'].shape[1] // disp_pred.shape[1]
        gt = batch['disp_postp'][:, ::s, ::s, 0]
        m = batch['disp_mask'][:, ::s, ::s, 0]
        losses['loss_disp'] = berhu_loss(disp_pred[..., 0], gt, m,
                                         cfg.disp_loss_weight)
        total = total + losses['loss_disp']
    if cfg.train_bbox:
        strides = module.cfg.strides
        priors = jnp.concatenate([
            level_priors(c.shape[1], c.shape[2], st)
            for c, st in zip(cls, strides)], axis=0)
        decoded, _ = decode_predictions(cls, reg, obj, strides)
        n = cls[0].shape[0]
        flat = lambda xs, d: jnp.concatenate(
            [x.reshape(n, -1, d) for x in xs], axis=1)
        det_losses = yolox_loss(
            flat(cls, cls[0].shape[-1]).astype(jnp.float32),
            flat(reg, 4).astype(jnp.float32),
            flat(obj, 1).astype(jnp.float32),
            priors, decoded, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'], loss_cfg)
        losses.update({k: v for k, v in det_losses.items() if k != 'loss'})
        total = total + det_losses['loss']
    losses['loss'] = total
    return total, (losses, mutated['batch_stats'])


def reset_lr_stage(optimizer_factory, base_lr: float, steps_per_epoch: int,
                   remaining_epochs: int):
    """ResetLRHook capability: a fresh optimizer with a restarted schedule
    for the completion stage."""
    from .schedules import yolox_schedule
    sched = yolox_schedule(base_lr, steps_per_epoch,
                           max_epochs=remaining_epochs, warmup_epochs=1,
                           num_last_epochs=0)
    return optimizer_factory(sched)
