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
