"""Learning-rate schedule of the canonical run: quadratic warmup ->
cosine annealing -> constant tail (reference param_scheduler,
configs/stereo_tracking/ocsort/yolox_s_mmyolo_mot_airdrone_disp.py:163-185).
"""
from __future__ import annotations

import optax


def yolox_schedule(base_lr: float, steps_per_epoch: int,
                   max_epochs: int = 50, warmup_epochs: int = 2,
                   num_last_epochs: int = 5,
                   eta_min_ratio: float = 0.05) -> optax.Schedule:
    warmup_steps = warmup_epochs * steps_per_epoch
    cosine_end = (max_epochs - num_last_epochs) * steps_per_epoch

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        # QuadraticWarmupLR: lr * (t / T)^2
        warm = base_lr * jnp.square(
            jnp.clip((step + 1) / warmup_steps, 0.0, 1.0))
        # CosineAnnealingLR between warmup end and cosine_end
        t = jnp.clip((step - warmup_steps) / max(cosine_end - warmup_steps, 1),
                     0.0, 1.0)
        eta_min = base_lr * eta_min_ratio
        cos = eta_min + (base_lr - eta_min) * 0.5 * \
            (1.0 + jnp.cos(jnp.pi * t))
        lr = jnp.where(step < warmup_steps, warm, cos)
        # constant tail keeps the last cosine value (factor=1)
        return lr

    return schedule


def siamrpn_exp_schedule(base_lr: float, steps_per_epoch: int,
                         num_epochs: int, start_factor: float = 0.1,
                         end_factor: float = 1.0, endpoint: bool = True):
    """SiamRPN exponential LR warm ramp
    (engine/schedulers/siamrpn_exp_scheduler.py): each epoch multiplies
    by (end/start)^(1/epochs) so the factor moves from ``start_factor``
    to ``end_factor`` geometrically over ``num_epochs`` epochs."""
    import jax.numpy as jnp
    denom = (num_epochs - 1) if endpoint and num_epochs > 1 else num_epochs
    ratio = (end_factor / start_factor) ** (1.0 / max(denom, 1))

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, num_epochs - 1)
        return base_lr * start_factor * ratio ** epoch

    return schedule
