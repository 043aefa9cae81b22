"""Training-step tests: loss sanity, SimOTA behavior, multichip dryrun."""
import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.train.losses import (SimOTAConfig, YOLOXLossConfig,
                                             simota_assign, yolox_loss)
from stereotracking_tpu.train.schedules import yolox_schedule
from stereotracking_tpu.models.yolox_head import level_priors


def test_simota_assigns_center_priors():
    priors = np.asarray(level_priors(8, 8, 8))  # 64 priors, stride 8
    # one gt covering priors around (24, 24)
    gt = np.array([[12.0, 12.0, 36.0, 36.0]], np.float32)
    decoded = np.tile(gt, (64, 1)) + \
        np.random.RandomState(0).uniform(-2, 2, (64, 4)).astype(np.float32)
    scores = np.full((64, 1), 0.6, np.float32)
    fg, mgt, miou = simota_assign(
        jnp.asarray(priors), jnp.asarray(decoded), jnp.asarray(scores),
        jnp.asarray(gt), jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
        1, SimOTAConfig())
    fg = np.asarray(fg)
    assert fg.sum() >= 1
    # every fg prior center must be inside gt box or center region
    for i in np.where(fg)[0]:
        px, py = priors[i, 0], priors[i, 1]
        assert 12 - 2.5 * 8 < px < 36 + 2.5 * 8
    assert (np.asarray(mgt)[fg] == 0).all()
    assert (np.asarray(miou)[fg] > 0.5).all()


def test_simota_no_gt_all_background():
    priors = jnp.asarray(level_priors(4, 4, 8))
    decoded = jnp.zeros((16, 4))
    scores = jnp.full((16, 1), 0.5)
    fg, _, _ = simota_assign(priors, decoded, scores,
                             jnp.zeros((2, 4)), jnp.zeros(2, jnp.int32),
                             jnp.zeros(2, bool), 1, SimOTAConfig())
    assert not bool(np.asarray(fg).any())


def test_yolox_loss_finite_and_decreases_obj():
    p = 16
    priors = jnp.asarray(level_priors(4, 4, 8))
    rng = np.random.RandomState(1)
    cls = jnp.asarray(rng.randn(2, p, 1).astype(np.float32))
    reg = jnp.asarray(rng.randn(2, p, 4).astype(np.float32) * 0.1)
    obj = jnp.asarray(rng.randn(2, p, 1).astype(np.float32))
    xy = reg[..., :2] * 8 + priors[None, :, :2]
    wh = jnp.exp(reg[..., 2:]) * 8
    decoded = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
    gt = jnp.asarray(np.array(
        [[[4, 4, 20, 20]], [[10, 10, 26, 26]]], np.float32))
    losses = yolox_loss(cls, reg, obj, priors, decoded, gt,
                        jnp.zeros((2, 1), jnp.int32), jnp.ones((2, 1), bool),
                        YOLOXLossConfig(use_l1=True))
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(losses['loss']) > 0


def test_schedule_shape():
    sched = yolox_schedule(1e-3, steps_per_epoch=100, max_epochs=50,
                           warmup_epochs=2, num_last_epochs=5)
    lrs = np.array([float(sched(s)) for s in
                    [0, 50, 199, 200, 2000, 4499, 4500, 4999]])
    assert lrs[0] < 1e-5                 # quadratic warmup start
    assert abs(lrs[2] - 1e-3) < 1e-5     # warmup end ~ base
    assert lrs[3] <= 1e-3 + 1e-6
    assert lrs[4] < lrs[3]               # cosine decays
    assert abs(lrs[6] - 5e-5) < 1e-6     # eta_min at cosine end
    assert abs(lrs[7] - lrs[6]) < 1e-9   # constant tail


def test_dryrun_multichip_8cpu():
    spec = importlib.util.spec_from_file_location(
        '__graft_entry__', Path(__file__).parent.parent / '__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert jax.device_count() >= 8
    mod.dryrun_multichip(8)
