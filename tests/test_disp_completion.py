"""Disparity-completion research track tests."""
import jax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.models.detector import DetectorConfig
from stereotracking_tpu.models.disp_completion import (CBAM, DispHead,
                                                       FCDiscriminator,
                                                       YOLOXDisp, berhu_loss)


def test_disp_head_decodes_to_half_resolution():
    head = DispHead(channels=64)
    x = jnp.zeros((1, 16, 20, 128))  # stride-8 features of a 128x160 image
    v = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(v, x, train=False)
    assert out.shape == (1, 64, 80, 1)   # stride 2
    assert (np.asarray(out) >= 0).all()  # ReLU output
    pred, feat = head.apply(v, x, train=False, return_feat=True)
    assert feat.shape == (1, 64, 80, 128)


def test_disp_head_v2_cbam():
    head = DispHead(channels=64, use_cbam=True)
    x = jnp.ones((1, 8, 8, 128))
    v = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 1)
    assert 'cbam1' in v['params']


def test_berhu_matches_reference_formula():
    rng = np.random.RandomState(0)
    pred = rng.rand(2, 16, 16).astype(np.float32) * 10
    label = rng.rand(2, 16, 16).astype(np.float32) * 10
    mask = (rng.rand(2, 16, 16) > 0.3).astype(np.float32)
    got = float(berhu_loss(jnp.asarray(pred), jnp.asarray(label),
                           jnp.asarray(mask)))
    # numpy replica of depth_loss.loss_calc_depth
    adiff = np.abs(pred - label) * mask
    c = 0.2 * adiff.max()
    t1 = adiff * (adiff <= c)
    t2 = ((adiff ** 2 + c ** 2) / (2 * c)) * (adiff > c)
    exp = (t1.sum() + t2.sum()) / mask.sum()
    assert abs(got - exp) < 1e-3


def test_berhu_is_l1_below_threshold():
    pred = jnp.asarray([[0.1, 0.0], [0.0, 0.0]])[None]
    label = jnp.zeros((1, 2, 2))
    # single nonzero error 0.1, c = 0.02 -> error above c: quadratic branch
    v = float(berhu_loss(pred, label))
    exp = (0.1 ** 2 + 0.02 ** 2) / (2 * 0.02) / 4
    assert abs(v - exp) < 1e-6


def test_discriminator_shapes():
    d = FCDiscriminator(ndf=16)
    x = jnp.zeros((2, 32, 32, 64))
    v = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(v, x)
    assert out.shape == (2, 1, 1, 1)


def test_multitask_forward():
    cfg = DetectorConfig()
    m = YOLOXDisp(cfg=cfg, head_channels=64)
    inputs = {
        'img': jnp.zeros((1, 64, 96, 3)),
        'disp_postp': jnp.zeros((1, 64, 96, 3)),
        'disp_mask': jnp.zeros((1, 64, 96, 1)),
    }
    v = m.init(jax.random.PRNGKey(0), inputs, train=False)
    (cls, reg, obj), disp = m.apply(v, inputs, train=False)
    assert len(cls) == 3
    assert disp.shape == (1, 32, 48, 1)  # stride 2
