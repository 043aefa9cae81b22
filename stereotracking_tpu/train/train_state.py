"""Train state, optimizer and the jittable training step.

Optimizer mirrors the canonical run (SGD nesterov momentum 0.9, weight decay
5e-4 excluding norms/biases, quadratic-warmup->cosine schedule, exponential-
momentum EMA with update_buffers=True; reference config
configs/stereo_tracking/ocsort/yolox_s_mmyolo_mot_airdrone_disp.py:154-204).

Parallelism is data-parallel over a ``jax.sharding.Mesh``: the batch is
sharded on the 'data' axis, parameters are replicated, and batch-norm
statistics are *globally* correct for free because under GSPMD a mean over a
sharded batch axis lowers to the cross-device collective (this is the
TPU-native SyncBN; reference converts modules via
torch SyncBatchNorm, yolo_detector_disparity_v1.py:55-57).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.detector import YOLOXDetector
from ..models.yolox_head import decode_predictions, level_priors
from .losses import YOLOXLossConfig, yolox_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any


def _decay_mask(params):
    """weight decay only for rank>1 kernels (norm scales & biases excluded),
    matching paramwise_cfg(norm_decay_mult=0, bias_decay_mult=0)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def make_optimizer(schedule, momentum: float = 0.9,
                   weight_decay: float = 5e-4) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=_decay_mask),
        optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=True),
    )


def create_train_state(module: YOLOXDetector, rng, input_shape: Tuple[int, int],
                       optimizer) -> TrainState:
    h, w = input_shape
    dummy = {
        'img': jnp.zeros((1, h, w, 3), jnp.float32),
        'disp_postp': jnp.zeros((1, h, w, 3), jnp.float32),
        'disp_mask': jnp.zeros((1, h, w, 1), jnp.float32),
    }
    variables = module.init(rng, dummy, train=True)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(
        step=jnp.int32(0), params=params, batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        ema_params=params, ema_batch_stats=batch_stats)


def ema_momentum(step, base_momentum: float = 1e-4, gamma: float = 2000.0):
    """mmyolo ExpMomentumEMA: momentum decays from 1 to ``base_momentum``."""
    return (1.0 - base_momentum) * jnp.exp(
        -(1.0 + step.astype(jnp.float32)) / gamma) + base_momentum


def train_step(state: TrainState, batch: dict, module: YOLOXDetector,
               optimizer, loss_cfg: YOLOXLossConfig
               ) -> Tuple[TrainState, dict]:
    """One optimizer step. ``batch``: dict with 'img', 'disp_postp',
    'disp_mask' (N, H, W, C) and 'gt_bboxes' (N, G, 4), 'gt_labels' (N, G),
    'gt_valid' (N, G)."""

    def loss_fn(params):
        inputs = {k: batch[k] for k in ('img', 'disp_postp', 'disp_mask')
                  if k in batch}
        (cls, reg, obj), mutated = module.apply(
            {'params': params, 'batch_stats': state.batch_stats},
            inputs, train=True, mutable=['batch_stats'])
        strides = module.cfg.strides
        priors = jnp.concatenate([
            level_priors(c.shape[1], c.shape[2], s)
            for c, s in zip(cls, strides)], axis=0)
        decoded, _ = decode_predictions(cls, reg, obj, strides)
        n = cls[0].shape[0]
        cls_flat = jnp.concatenate(
            [c.reshape(n, -1, c.shape[-1]) for c in cls], axis=1)
        reg_flat = jnp.concatenate(
            [r.reshape(n, -1, 4) for r in reg], axis=1)
        obj_flat = jnp.concatenate(
            [o.reshape(n, -1, 1) for o in obj], axis=1)
        losses = yolox_loss(
            cls_flat.astype(jnp.float32), reg_flat.astype(jnp.float32),
            obj_flat.astype(jnp.float32), priors, decoded,
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            loss_cfg)
        return losses['loss'], (losses, mutated['batch_stats'])

    grads, (losses, new_stats) = jax.grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    m = ema_momentum(state.step)
    ema = jax.tree.map(lambda e, p: e * (1 - m) + p * m,
                       state.ema_params, new_params)
    ema_stats = jax.tree.map(lambda e, p: e * (1 - m) + p * m,
                             state.ema_batch_stats, new_stats)

    return TrainState(
        step=state.step + 1, params=new_params, batch_stats=new_stats,
        opt_state=new_opt, ema_params=ema,
        ema_batch_stats=ema_stats), losses
