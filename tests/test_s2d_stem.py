"""Space-to-depth stem/stage1 evaluation path: exact kernel-remap algebra
and full-backbone numerical equivalence with the canonical path on a shared
parameter tree (layers.focus_kernel_to_s2d4 / stage_kernel_to_s2d2)."""
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.models.layers import (
    Focus, focus_kernel_to_s2d4, focus_kernel_to_strided,
    space_to_depth, stage_kernel_to_s2d2)


def _conv(x, w, s, pad):
    return lax.conv_general_dilated(
        x, w, (s, s), padding=pad,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def test_space_to_depth_layout():
    x = jnp.arange(2 * 8 * 8 * 3).reshape(2, 8, 8, 3).astype(jnp.float32)
    y = space_to_depth(x, 4)
    assert y.shape == (2, 2, 2, 48)
    # channel (ty*4+tx)*C + c holds raw pixel (4*qy+ty, 4*qx+tx, c)
    for ty, tx, c in [(0, 0, 0), (1, 3, 2), (3, 2, 1)]:
        np.testing.assert_array_equal(
            np.asarray(y[:, 1, 0, (ty * 4 + tx) * 3 + c]),
            np.asarray(x[:, 4 + ty, tx, c]))


def test_focus_s2d4_remap_matches_strided_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    w0 = jnp.asarray(rng.rand(3, 3, 12, 8).astype(np.float32))
    y_ref = _conv(x, focus_kernel_to_strided(w0), 2, [(2, 3), (2, 3)])
    y4 = _conv(space_to_depth(x, 4), focus_kernel_to_s2d4(w0), 1, 'SAME')
    n, hq, wq, _ = y4.shape
    y_std = y4.reshape(n, hq, wq, 2, 2, 8).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, hq * 2, wq * 2, 8)
    np.testing.assert_allclose(np.asarray(y_std), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_stage_s2d2_remap_matches_strided_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 24, 8).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 8, 16).astype(np.float32))
    y_ref = _conv(x, w, 2, [(1, 1), (1, 1)])
    y2 = _conv(space_to_depth(x, 2), stage_kernel_to_s2d2(w), 1,
               [(1, 0), (1, 0)])
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_focus_module_s2d_path_same_params():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 32, 48, 3).astype(np.float32))
    m = Focus(8)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = m.apply(v, x, train=False)                     # fused 6x6 path
    y4 = m.apply(v, space_to_depth(x, 4), train=False, s2d=True)
    n, hq, wq, _ = y4.shape
    y_std = y4.reshape(n, hq, wq, 2, 2, 8).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, hq * 2, wq * 2, 8)
    np.testing.assert_allclose(np.asarray(y_std), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_dual_backbone_s2d_matches_canonical():
    """CSPDarknetDual eval outputs are identical whether the s2d fast path
    runs or not (tiny deepen/widen for CPU speed)."""
    import stereotracking_tpu.models.csp_darknet as cd
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
    disp = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
    bb = cd.CSPDarknetDual(deepen_factor=0.33, widen_factor=0.125)
    v = bb.init(jax.random.PRNGKey(1), {'img': img, 'disp_postp': disp})
    out_fast = bb.apply(v, {'img': img, 'disp_postp': disp})
    orig = cd._use_s2d
    cd._use_s2d = lambda x, train: False
    try:
        out_ref = bb.apply(v, {'img': img, 'disp_postp': disp})
    finally:
        cd._use_s2d = orig
    for a, b in zip(out_fast, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_folded_kernel_remaps_match_standard_convs():
    """W-fold remap algebra: each folded kernel reproduces its standard
    conv exactly (layers.{stage_kernel_to_s2d2_folded, conv1x1/
    conv3x3_kernel_folded, concat1x1_kernel_folded,
    consume_folded_kernel})."""
    from stereotracking_tpu.models.layers import (
        concat1x1_kernel_folded, consume_folded_kernel,
        conv1x1_kernel_folded, conv3x3_kernel_folded,
        stage_kernel_to_s2d2_folded)

    rng = np.random.RandomState(0)

    def fold(x):
        # W-fold layout: folded[:, :, q, u*C + c] == x[:, :, 2*q + u, c]
        n, h, w, c = x.shape
        return x.reshape(n, h, w // 2, 2, c).reshape(n, h, w // 2, 2 * c)

    x = jnp.asarray(rng.rand(1, 8, 12, 6).astype(np.float32))
    xf = fold(x)

    # 1x1
    w1 = jnp.asarray(rng.rand(1, 1, 6, 4).astype(np.float32))
    ref = _conv(x, w1, 1, [(0, 0), (0, 0)])
    got = _conv(xf, conv1x1_kernel_folded(w1), 1, [(0, 0), (0, 0)])
    np.testing.assert_allclose(np.asarray(fold(ref)), np.asarray(got),
                               rtol=1e-5, atol=1e-5)

    # 3x3 stride 1 SAME
    w3 = jnp.asarray(rng.rand(3, 3, 6, 4).astype(np.float32))
    ref = _conv(x, w3, 1, [(1, 1), (1, 1)])
    got = _conv(xf, conv3x3_kernel_folded(w3), 1, [(1, 1), (1, 1)])
    np.testing.assert_allclose(np.asarray(fold(ref)), np.asarray(got),
                               rtol=1e-4, atol=1e-5)

    # concat final conv: standard input concat([a, b]) vs folded halves
    a = x
    b = jnp.asarray(rng.rand(1, 8, 12, 6).astype(np.float32))
    wc = jnp.asarray(rng.rand(1, 1, 12, 5).astype(np.float32))
    ref = _conv(jnp.concatenate([a, b], -1), wc, 1, [(0, 0), (0, 0)])
    cat_f = jnp.concatenate([fold(a), fold(b)], -1)
    got = _conv(cat_f, concat1x1_kernel_folded(wc, 6), 1,
                [(0, 0), (0, 0)])
    np.testing.assert_allclose(np.asarray(fold(ref)), np.asarray(got),
                               rtol=1e-4, atol=1e-5)

    # consume: 3x3 stride-2 standard vs folded input
    w5 = jnp.asarray(rng.rand(3, 3, 6, 4).astype(np.float32))
    ref = _conv(x, w5, 2, [(1, 1), (1, 1)])
    got = lax.conv_general_dilated(
        fold(x), consume_folded_kernel(w5), (2, 1),
        padding=[(1, 1), (1, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)

    # stage s2d2 + fold-out: standard 3x3 s2 on (16, 24, C) vs s2d2 input
    xs = jnp.asarray(rng.rand(1, 16, 24, 6).astype(np.float32))
    ws = jnp.asarray(rng.rand(3, 3, 6, 4).astype(np.float32))
    ref = _conv(xs, ws, 2, [(1, 1), (1, 1)])           # (1, 8, 12, 4)
    got = lax.conv_general_dilated(
        space_to_depth(xs, 2), stage_kernel_to_s2d2_folded(ws), (1, 2),
        padding=[(1, 0), (1, 2)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))    # (1, 8, 6, 8)
    np.testing.assert_allclose(np.asarray(fold(ref)), np.asarray(got),
                               rtol=1e-4, atol=1e-5)


def test_stride2_folded_io_kernel():
    from stereotracking_tpu.models.layers import stride2_folded_io_kernel
    rng = np.random.RandomState(5)

    def fold(x):
        n, h, w, c = x.shape
        return x.reshape(n, h, w // 2, 2, c).reshape(n, h, w // 2, 2 * c)

    x = jnp.asarray(rng.rand(1, 16, 24, 6).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 6, 4).astype(np.float32))
    ref = _conv(x, w, 2, [(1, 1), (1, 1)])             # (1, 8, 12, 4)
    got = lax.conv_general_dilated(
        fold(x), stride2_folded_io_kernel(w), (2, 2),
        padding=[(1, 1), (1, 2)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))    # (1, 8, 6, 8)
    np.testing.assert_allclose(np.asarray(fold(ref)), np.asarray(got),
                               rtol=1e-4, atol=1e-5)
