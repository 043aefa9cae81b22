"""Equivalence of the pallas Focus-stem kernel against the canonical path.

The pallas kernel (ops/stem_pallas.py) must reproduce the Focus conv + BN +
SiLU exactly (up to bf16 rounding) in space_to_depth(., 2) layout, for both
the RGB (C=3) and 1-channel disparity branches, consuming the host-packed
patch layout (numpy packer == XLA packer == C++ packer).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.layers import (focus_kernel_to_strided,
                                              space_to_depth)
from stereotracking_tpu.ops.stem_pallas import (focus_stem_pallas, fold_bn,
                                                pack_focus_kernel,
                                                stem_pack_np, stem_pack_wq,
                                                stem_pack_xla)

INTERP = jax.default_backend() != 'tpu'


def _setup(c, o, seed=0):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.randn(3, 3, 4 * c, o).astype(np.float32) * 0.1)
    bn = dict(gamma=jnp.asarray(rng.rand(o).astype(np.float32) + 0.5),
              beta=jnp.asarray(rng.randn(o).astype(np.float32) * 0.1),
              mean=jnp.asarray(rng.randn(o).astype(np.float32) * 0.1),
              var=jnp.asarray(rng.rand(o).astype(np.float32) + 0.5))
    return w, bn


def _canonical(x, w, bn, eps=1e-3):
    """Focus conv + BN + SiLU evaluated in f32 (6x6 stride-2 raw form)."""
    w6 = focus_kernel_to_strided(w)
    y = jax.lax.conv_general_dilated(
        x[None], w6, (2, 2), [(2, 3), (2, 3)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
    inv = bn['gamma'] / jnp.sqrt(bn['var'] + eps)
    y = (y - bn['mean']) * inv + bn['beta']
    return y * jax.nn.sigmoid(y)


def test_packers_agree():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 64, 3), np.uint8)
    a = stem_pack_np(img)
    b = np.asarray(stem_pack_xla(jnp.asarray(img), dtype=jnp.uint8))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (9, 48, stem_pack_wq(64))


@pytest.mark.parametrize('c,h,w_', [(3, 64, 96), (1, 64, 96), (3, 40, 64)])
def test_stem_pallas_matches_canonical(c, h, w_):
    o = 32
    w, bn = _setup(c, o)
    rng = np.random.RandomState(1)
    x = rng.rand(h, w_, c).astype(np.float32) * 255.0

    ref = _canonical(jnp.asarray(x), w, bn)
    ref_s2d = space_to_depth(ref[None], 2)[0]      # (H/4, W/4, 4O)

    kp = pack_focus_kernel(focus_kernel_to_strided(w))
    scale, bias = fold_bn(bn['gamma'], bn['beta'], bn['mean'], bn['var'],
                          1e-3)
    xp = jnp.asarray(stem_pack_np(np.float32(x))).astype(jnp.bfloat16)
    out = focus_stem_pallas(xp, kp, scale, bias, w_ // 4, interpret=INTERP)

    assert out.shape == ref_s2d.shape
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref_s2d)))
    scale_ref = float(np.max(np.abs(np.asarray(ref_s2d)))) + 1e-6
    assert err / scale_ref < 2e-2, (err, scale_ref)


def test_stem_pallas_uint8_input():
    """uint8 packed input (the production RGB path) == float path."""
    o = 16
    w, bn = _setup(3, o, seed=4)
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (32, 64, 3), np.uint8)
    kp = pack_focus_kernel(focus_kernel_to_strided(w))
    scale, bias = fold_bn(bn['gamma'], bn['beta'], bn['mean'], bn['var'],
                          1e-3)
    xq = jnp.asarray(stem_pack_np(img))
    out_u8 = focus_stem_pallas(xq, kp, scale, bias, 16, interpret=INTERP)
    ref = _canonical(jnp.asarray(img, jnp.float32), w, bn)
    ref_s2d = np.asarray(space_to_depth(ref[None], 2)[0])
    err = np.max(np.abs(np.asarray(out_u8, np.float32) - ref_s2d))
    assert err < 0.02 * np.max(np.abs(ref_s2d)) + 1e-3


def test_stem_pallas_one_channel_equals_summed_kernel():
    """Feeding the 1-channel disparity with a c-summed kernel equals feeding
    the 3x-repeated disparity with the full kernel (preprocessor contract:
    disp_postp = repeat(disp, 3))."""
    o = 16
    w, bn = _setup(3, o, seed=2)
    rng = np.random.RandomState(3)
    d = rng.rand(32, 64, 1).astype(np.float32) * 100.0

    w6 = focus_kernel_to_strided(w)                # (6, 6, 3, O)
    w6_sum = jnp.sum(w6, axis=2, keepdims=True)    # (6, 6, 1, O)
    scale, bias = fold_bn(bn['gamma'], bn['beta'], bn['mean'], bn['var'],
                          1e-3)

    xp1 = jnp.asarray(stem_pack_np(d)).astype(jnp.bfloat16)
    xp3 = jnp.asarray(stem_pack_np(np.repeat(d, 3, -1))).astype(jnp.bfloat16)
    out1 = focus_stem_pallas(xp1, pack_focus_kernel(w6_sum), scale, bias,
                             16, interpret=INTERP)
    out3 = focus_stem_pallas(xp3, pack_focus_kernel(w6), scale, bias,
                             16, interpret=INTERP)
    a, b = np.asarray(out1, np.float32), np.asarray(out3, np.float32)
    assert np.max(np.abs(a - b)) <= 0.02 * np.max(np.abs(b)) + 1e-3


def test_predict_frame_packed_matches_raw():
    """Full per-frame MOT program with host-packed pallas stems vs the
    canonical path: same program, same parameters, detections must agree
    (bf16 stem rounding only)."""
    import ml_dtypes
    from stereotracking_tpu.models.mot import MOTConfig, predict_frame_raw
    from stereotracking_tpu.models import tracker as trk
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 64, 96
    cfg = MOTConfig()
    ms = MultiStreamTracker(cfg, n_streams=1, input_shape=(h, w))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    disp = rng.randint(16, 1600, (h, w), np.uint16)

    from stereotracking_tpu.models.preprocessor import preprocess_frame_pure
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs

    inputs = preprocess_frame_pure(jnp.asarray(img), jnp.asarray(disp), h, w)
    cls_r, reg_r, obj_r = ms.module.apply(ms.variables, inputs, train=False)

    ip, dp = MultiStreamTracker.pack_frames(img[None], disp[None], h, w)
    so, dso = pallas_stem_outputs(
        ms.variables['params']['backbone'],
        ms.variables['batch_stats']['backbone'],
        jnp.asarray(ip[0]), jnp.asarray(dp[0]), w // 4, interpret=True)
    inputs_pk = {**inputs, 'stem_out': so, 'disp_stem_out': dso}
    cls_p, reg_p, obj_p = ms.module.apply(ms.variables, inputs_pk,
                                          train=False)

    for a, b in zip((cls_r, reg_r, obj_r), (cls_p, reg_p, obj_p)):
        for xa, xb in zip(a, b):
            xa, xb = np.asarray(xa, np.float32), np.asarray(xb, np.float32)
            scale = np.max(np.abs(xa)) + 1e-6
            assert np.max(np.abs(xa - xb)) / scale < 5e-2

    # and the full per-frame program runs end-to-end with packed inputs
    state0 = trk.init_state(cfg.tracker)
    _, res_pk = predict_frame_raw(
        ms.variables, ms.module, state0, jnp.asarray(img),
        jnp.asarray(disp), jnp.int32(0), cfg, h, w,
        img_pack=jnp.asarray(ip[0]), disp_pack=jnp.asarray(dp[0]))
    assert np.asarray(res_pk.det_valid).shape[0] > 0


def test_device_packers_bit_identical_to_host():
    """MXU selection-matmul packers (stem_pack_device/_disp_device) must be
    bit-identical to the C++ SIMD packer — including the /16 bf16
    round-to-nearest-even (csrc/stem_pack.cpp:42-48) and the pad-to-
    (out_h, out_w) the loader applies before packing."""
    from stereotracking_tpu.ops.stem_pallas import (stem_pack_device,
                                                    stem_pack_disp_device)
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker
    rng = np.random.RandomState(3)
    h, w = 116, 212            # not /16 -> loader pads to 128x224
    oh, ow = 128, 224
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    disp = rng.randint(0, 4000, (h, w)).astype(np.uint16)
    disp[5:9, 7:20] = 65535    # invalid-pixel sentinel -> 0
    ip, dp = MultiStreamTracker.pack_frames(img[None], disp[None], oh, ow)
    gi = np.asarray(stem_pack_device(jnp.asarray(img), oh, ow))
    gd = np.asarray(stem_pack_disp_device(jnp.asarray(disp), oh, ow))
    np.testing.assert_array_equal(np.asarray(ip[0]).astype(np.float32),
                                  gi.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(dp[0]).view(np.uint16),
                                  gd.view(np.uint16))


def test_predict_frame_device_pack_equals_host_pack():
    """pack_backend='device' inside predict_frame_raw must reproduce the
    explicitly host-packed call exactly (packs are bit-identical, so the
    whole frame program is)."""
    from stereotracking_tpu.models.mot import MOTConfig, predict_frame_raw
    from stereotracking_tpu.models import tracker as trk
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 64, 96
    cfg = MOTConfig(stem_backend='pallas', pack_backend='device')
    ms = MultiStreamTracker(cfg, n_streams=1, input_shape=(h, w))
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    disp = rng.randint(16, 1600, (h, w), np.uint16)
    state0 = trk.init_state(cfg.tracker)

    ip, dp = MultiStreamTracker.pack_frames(img[None], disp[None], h, w)
    _, res_host = predict_frame_raw(
        ms.variables, ms.module, state0, jnp.asarray(img),
        jnp.asarray(disp), jnp.int32(0), cfg, h, w,
        img_pack=jnp.asarray(ip[0]), disp_pack=jnp.asarray(dp[0]))
    _, res_dev = predict_frame_raw(
        ms.variables, ms.module, state0, jnp.asarray(img),
        jnp.asarray(disp), jnp.int32(0), cfg, h, w)
    np.testing.assert_array_equal(np.asarray(res_host.det_valid),
                                  np.asarray(res_dev.det_valid))
    np.testing.assert_allclose(np.asarray(res_host.det_bboxes, np.float32),
                               np.asarray(res_dev.det_bboxes, np.float32))
