"""Stark SOT stack: crop semantics, positional encoding, losses, and
(env-gated) full-module/tracker behavior.

Reference: mmtrack/models/sot/stark.py (crop + template memory),
mmtrack/models/track_heads/stark_head.py (transformer head, corner
soft-argmax, stage losses)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.sot.stark import (
    StarkModule, StarkTestCfg, StarkTracker, sine_positional_encoding,
    stark_crop, stark_stage1_loss, stark_stage2_loss)

SLOW = os.environ.get('STTPU_SLOW_TESTS') != '1'


def test_stark_crop_identity_and_resize_factor():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(100, 120, 3).astype(np.float32))
    # sqrt(w*h)*factor = 40 -> x1 = round(60-20) = 40, window [40, 80)
    crop, rf, pm = stark_crop(img, jnp.asarray([60., 50., 20., 20.]),
                              2.0, 40)
    assert abs(float(rf) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(crop),
                               np.asarray(img[30:70, 40:80]), atol=1e-5)
    assert float(pm.max()) == 0.0


def test_stark_crop_padding_mask_on_boundary():
    img = jnp.ones((50, 50, 3), jnp.float32)
    crop, _, pm = stark_crop(img, jnp.asarray([0., 0., 20., 20.]), 2.0, 40)
    pm = np.asarray(pm)
    # top-left quadrant of the crop window is outside the image
    assert pm[0, 0] == 1.0
    assert pm[-1, -1] == 0.0
    # zero padding
    assert abs(float(crop[0, 0, 0])) < 1e-6


def test_sine_positional_encoding_shapes_and_distinctness():
    pos = sine_positional_encoding(jnp.zeros((1, 6, 7)), 128)
    assert pos.shape == (1, 6, 7, 256)
    p = np.asarray(pos[0]).reshape(-1, 256)
    # all positions distinct
    assert len(np.unique(p.round(5), axis=0)) == 42


def test_stage1_loss_perfect_is_zero_iou():
    b = jnp.asarray([[10., 10., 50., 60.]])
    d = stark_stage1_loss(b, b, 160)
    assert abs(float(d['loss_iou'])) < 1e-5
    assert abs(float(d['loss_bbox'])) < 1e-6


def test_stage2_loss_matches_bce():
    d = stark_stage2_loss(jnp.asarray([0.0]), jnp.asarray([1.0]))
    assert abs(float(d['loss_cls']) - np.log(2)) < 1e-5


@pytest.mark.skipif(SLOW, reason='set STTPU_SLOW_TESTS=1 for model tests')
def test_stark_module_and_tracker():
    cfg = StarkTestCfg(template_size=64, search_size=160)
    m = StarkModule(cfg)
    z = jnp.zeros((1, 64, 64, 3))
    x = jnp.zeros((1, 160, 160, 3))
    zm = jnp.zeros((1, 64, 64))
    xm = jnp.zeros((1, 160, 160))
    v = m.init(jax.random.PRNGKey(0), [z, z], [zm, zm], x, xm)
    logits, bboxes = m.apply(v, [z, z], [zm, zm], x, xm)
    assert logits.shape == (1, 1, 1) and bboxes.shape == (1, 4)
    assert np.isfinite(np.asarray(bboxes)).all()

    trk = StarkTracker(v, cfg)
    frame = jnp.asarray(np.random.RandomState(1).rand(240, 320, 3),
                        jnp.float32)
    st = trk.init(frame, [100., 80., 140., 120.])
    st, (bb, sc) = trk.track(frame, st)
    bb = np.asarray(bb)
    assert np.isfinite(bb).all() and 0.0 <= float(sc) <= 1.0
    assert bb[2] > bb[0] and bb[3] > bb[1]
