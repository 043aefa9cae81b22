"""Equivalence of the fused pallas depth kernel vs the XLA base path.

The kernel (ops/depth_pallas.py) must reproduce
``ops.depth.extract_box_depths_disp`` — itself pinned bit-identical to the
reference float-path semantics by tests/test_depth.py — for every box
regime: small boxes, boxes on every pyramid level, degenerate/negative/
out-of-frame boxes, >MAX_BOX_W skips, empty-validity windows.  Integer
rank selection is exact by construction; the final depth may differ by
f32 sum-reassociation ULPs (module docstring), bounded here at rtol 2e-6.
Runs in interpret mode on the CPU test backend.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stereotracking_tpu.ops.depth import extract_box_depths_disp
from stereotracking_tpu.ops.depth_pallas import (
    extract_box_depths_disp_pallas)

BASELINE, FOCAL = 0.25, 640.0


def _rand_world(seed, h, w, n_boxes, max_size=120, disp_hi=1600):
    rng = np.random.RandomState(seed)
    disp = rng.randint(0, disp_hi, (h, w)).astype(np.float32) / 16.0
    # sprinkle invalid (==0) regions
    disp[rng.rand(h, w) < 0.1] = 0.0
    boxes = rng.uniform(-20, max(h, w) + 20, (n_boxes, 4)).astype(
        np.float32)
    sizes = rng.uniform(1, max_size, (n_boxes, 2)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + sizes
    valid = rng.rand(n_boxes) > 0.15
    return jnp.asarray(disp), jnp.asarray(boxes), jnp.asarray(valid)


def _check(disp, boxes, valid, crop):
    bd, bs = extract_box_depths_disp(disp, boxes, valid, BASELINE, FOCAL,
                                     crop)
    pd, ps = extract_box_depths_disp_pallas(disp, boxes, valid, BASELINE,
                                            FOCAL, crop)
    bd, bs, pd, ps = map(np.asarray, (bd, bs, pd, ps))
    # the -1/invalid pattern must match exactly
    np.testing.assert_array_equal(bd == -1.0, pd == -1.0)
    np.testing.assert_allclose(pd, bd, rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(ps, bs, rtol=2e-6, atol=1e-5)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_small_boxes(seed):
    disp, boxes, valid = _rand_world(seed, 240, 320, 32, max_size=60)
    _check(disp, boxes, valid, crop=64)


def test_pyramid_levels():
    # boxes sized to hit levels 0..3 (crop 32: sizes up to 256+)
    disp, _, _ = _rand_world(3, 400, 512, 1)
    rng = np.random.RandomState(4)
    boxes = []
    for size in (10, 30, 50, 100, 200, 400, 500):
        x1 = rng.uniform(0, 400 - 1)
        y1 = rng.uniform(0, 300 - 1)
        boxes.append([x1, y1, x1 + size, y1 + size * 0.7])
    boxes = jnp.asarray(np.array(boxes, np.float32))
    valid = jnp.ones((boxes.shape[0],), bool)
    _check(disp, boxes, valid, crop=32)


def test_edge_cases():
    disp, _, _ = _rand_world(5, 200, 280, 1)
    boxes = jnp.asarray(np.array([
        [-30, -30, -5, -5],        # fully outside (negative -> skip)
        [-10, -10, 40, 40],        # straddles origin (negative -> skip)
        [250, 150, 300, 220],      # x1 < w but box exits right/bottom
        [279, 199, 400, 400],      # 1px inside corner
        [50, 50, 50, 80],          # zero width
        [50, 50, 900, 120],        # wider than MAX_BOX_W -> skip
        [10, 10, 12, 12],          # tiny
        [0, 0, 280, 200],          # whole frame
    ], np.float32))
    valid = jnp.ones((boxes.shape[0],), bool)
    _check(disp, boxes, valid, crop=32)


def test_invalid_disparity_window():
    # a region of all-invalid disparity -> n = 0 -> -1 depth
    disp = jnp.zeros((160, 240), jnp.float32)
    boxes = jnp.asarray(np.array([[20, 20, 60, 60]], np.float32))
    valid = jnp.ones((1,), bool)
    bd, bs = extract_box_depths_disp(disp, boxes, valid, BASELINE, FOCAL,
                                     32)
    pd, ps = extract_box_depths_disp_pallas(disp, boxes, valid, BASELINE,
                                            FOCAL, 32)
    assert float(bd[0]) == -1.0 and float(pd[0]) == -1.0
    assert float(bs[0]) == 1.0 and float(ps[0]) == 1.0


def test_vmap_folds_to_stream_axis():
    ds, bs_, vs = [], [], []
    for seed in range(3):
        d, b, v = _rand_world(10 + seed, 160, 240, 16, max_size=50)
        ds.append(d)
        bs_.append(b)
        vs.append(v)
    ds = jnp.stack(ds)
    bs_ = jnp.stack(bs_)
    vs = jnp.stack(vs)

    fn = lambda d, b, v: extract_box_depths_disp_pallas(
        d, b, v, BASELINE, FOCAL, 32)
    vd, vsc = jax.vmap(fn)(ds, bs_, vs)
    for i in range(3):
        sd, ssc = fn(ds[i], bs_[i], vs[i])
        np.testing.assert_array_equal(np.asarray(vd[i]), np.asarray(sd))
        np.testing.assert_array_equal(np.asarray(vsc[i]), np.asarray(ssc))


def test_vmap_inside_jit():
    d, b, v = _rand_world(20, 160, 240, 8, max_size=40)
    ds = jnp.stack([d, d * 0.5 + 1.0])
    bs_ = jnp.stack([b, b + 3.0])
    vs = jnp.stack([v, v])

    @jax.jit
    def run(ds, bs_, vs):
        return jax.vmap(lambda x, y, z: extract_box_depths_disp_pallas(
            x, y, z, BASELINE, FOCAL, 32))(ds, bs_, vs)

    vd, _ = run(ds, bs_, vs)
    base = jax.vmap(lambda x, y, z: extract_box_depths_disp(
        x, y, z, BASELINE, FOCAL, 32))(ds, bs_, vs)[0]
    np.testing.assert_allclose(np.asarray(vd), np.asarray(base),
                               rtol=2e-6, atol=1e-5)


def test_full_program_ab():
    """predict_frame with depth_backend='pallas' must reproduce the XLA
    program end-to-end (tracker ids/boxes/depths), the same A/B shape as
    tests/test_stem_pallas.py gives the stem kernel."""
    from stereotracking_tpu.models import tracker as trk
    from stereotracking_tpu.models.detector import DetectorConfig
    from stereotracking_tpu.models.mot import MOTConfig, OCSORTDisparity
    from stereotracking_tpu.models.preprocessor import (padded_shape,
                                                        preprocess_frame)
    from synthetic import SyntheticSequence

    h, w = 96, 128
    oh, ow = padded_shape(h, w)
    base_cfg = MOTConfig(
        detector=DetectorConfig(pre_nms_top_k=128, max_per_img=32),
        tracker=trk.TrackerConfig(num_slots=8, num_dets=8),
        depth_crop=32)
    m_x = OCSORTDisparity(base_cfg, input_shape=(oh, ow))
    m_p = OCSORTDisparity(base_cfg._replace(depth_backend='pallas'),
                          variables=m_x.variables, input_shape=(oh, ow))
    seq = SyntheticSequence(seed=7, h=h, w=w)
    for t in range(3):
        img, disp, _ = seq.frame(t)
        inputs = preprocess_frame(jnp.asarray(img), jnp.asarray(disp),
                                  oh, ow)
        rx = m_x.track(inputs, t)
        rp = m_p.track(inputs, t)
        np.testing.assert_array_equal(np.asarray(rx.track_ids),
                                      np.asarray(rp.track_ids))
        np.testing.assert_array_equal(np.asarray(rx.track_valid),
                                      np.asarray(rp.track_valid))
        np.testing.assert_allclose(np.asarray(rp.track_bboxes),
                                   np.asarray(rx.track_bboxes),
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(rp.track_depths),
                                   np.asarray(rx.track_depths),
                                   rtol=2e-6, atol=1e-4)
