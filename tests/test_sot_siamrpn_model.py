"""SiamRPN full-module + functional-tracker behavior at reduced crop sizes
(63/127 — same backbone strides and head algebra as the canonical 127/255,
an order of magnitude cheaper to compile on the CPU test backend)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.sot import (SiamRPNModule, SiamRPNTestCfg,
                                           SiamRPNTracker)
from stereotracking_tpu.models.sot.siamrpn import _sot_backbone_size

SMALL = SiamRPNTestCfg(exemplar_size=63, search_size=127)


def test_backbone_size_formula():
    assert _sot_backbone_size(255) == 31
    assert _sot_backbone_size(127) == 15
    assert _sot_backbone_size(63) == 7


def _build():
    m = SiamRPNModule(center_size=7)
    z = jnp.zeros((1, 63, 63, 3))
    x = jnp.zeros((1, 127, 127, 3))
    v = m.init(jax.random.PRNGKey(0), z, x)
    return m, v, z, x


def test_module_shapes_small():
    m, v, z, x = _build()
    zf = m.apply(v, z, method=SiamRPNModule.template)
    xf = m.apply(v, x, method=SiamRPNModule.search)
    assert [f.shape for f in zf] == [(1, 7, 7, 256)] * 3
    assert [f.shape for f in xf] == [(1, 15, 15, 256)] * 3
    cls, reg = m.apply(v, zf, xf, method=SiamRPNModule.rpn)
    # 15 -> conv 13; 7 -> conv 5; xcorr -> 9
    assert cls.shape == (1, 9, 9, 10)
    assert reg.shape == (1, 9, 9, 20)


def test_tracker_step_and_state():
    m, v, _, _ = _build()
    trk = SiamRPNTracker(v, SMALL)
    assert trk._feat == 9
    img = jnp.asarray(np.random.RandomState(0).rand(160, 200, 3),
                      jnp.float32)
    st = trk.init(img, [60., 50., 100., 90.])
    np.testing.assert_allclose(np.asarray(st.bbox), [80., 70., 40., 40.])
    st2, (bb, sc) = trk.track(img, st)
    bb = np.asarray(bb)
    assert np.isfinite(bb).all() and np.isfinite(float(sc))
    assert bb[2] > bb[0] and bb[3] > bb[1]
    # box stays inside the image (clip semantics, siamese_rpn_head.py:669)
    assert 0 <= np.asarray(st2.bbox)[0] <= 200
    assert 0 <= np.asarray(st2.bbox)[1] <= 160
    assert np.asarray(st2.bbox)[2] >= 10 and np.asarray(st2.bbox)[3] >= 10
    # smoothing: new size is a blend of previous and predicted
    # (lr in [0, 0.38]) so it cannot stray far in a single frame
    assert abs(np.asarray(st2.bbox)[2] - 40) < 40 * 0.5


@pytest.mark.skipif(os.environ.get('STTPU_SLOW_TESTS') != '1',
                    reason='canonical 127/255 sizes are compile-heavy')
def test_tracker_canonical_sizes():
    m = SiamRPNModule(center_size=7)
    z = jnp.zeros((1, 127, 127, 3))
    x = jnp.zeros((1, 255, 255, 3))
    v = m.init(jax.random.PRNGKey(0), z, x)
    trk = SiamRPNTracker(v)
    assert trk._feat == 25
    img = jnp.asarray(np.random.RandomState(1).rand(480, 640, 3),
                      jnp.float32)
    st = trk.init(img, [200., 150., 280., 230.])
    st, (bb, sc) = trk.track(img, st)
    assert np.isfinite(np.asarray(bb)).all()
