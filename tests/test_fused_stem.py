"""Fused Focus stem: exact equivalence with the space-to-depth reference
path (mmdet Focus semantics), shared parameter layout, train-mode batch
stats, and gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.layers import Focus, focus_kernel_to_strided


def _random_inputs(rng, n=2, h=32, w=48, c=3):
    return jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))


def test_kernel_remap_is_exact_pointwise():
    """Brute-force check of the remap index algebra: every tap of the
    2k x 2k kernel equals the Focus tap it was derived from."""
    rng = np.random.RandomState(0)
    k, c, o = 3, 3, 4
    w3 = rng.randn(k, k, 4 * c, o).astype(np.float32)
    w6 = np.asarray(focus_kernel_to_strided(jnp.asarray(w3)))
    assert w6.shape == (2 * k, 2 * k, c, o)
    for ky in range(k):
        for kx in range(k):
            for dy in range(2):
                for dx in range(2):
                    s = dx * 2 + dy  # concat order [tl, bl, tr, br]
                    np.testing.assert_array_equal(
                        w6[2 * ky + dy, 2 * kx + dx],
                        w3[ky, kx, s * c:(s + 1) * c])


@pytest.mark.parametrize('shape', [(2, 32, 48, 3), (1, 64, 64, 3),
                                   (3, 30, 46, 5)])
def test_fused_matches_reference_forward(shape):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32))
    ref = Focus(16, fused=False)
    fus = Focus(16, fused=True)
    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    # identical parameter trees: fused variant consumes the same checkpoint
    v2 = fus.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    y_ref = ref.apply(variables, x, train=False)
    y_fus = fus.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_reference_train_mode_and_stats():
    rng = np.random.RandomState(2)
    x = _random_inputs(rng)
    ref = Focus(8, fused=False)
    fus = Focus(8, fused=True)
    variables = ref.init(jax.random.PRNGKey(3), x, train=True)
    y_ref, m_ref = ref.apply(variables, x, train=True,
                             mutable=['batch_stats'])
    y_fus, m_fus = fus.apply(variables, x, train=True,
                             mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(m_ref), jax.tree.leaves(m_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_gradients_match_reference():
    rng = np.random.RandomState(4)
    x = _random_inputs(rng, n=1, h=16, w=16)
    ref = Focus(8, fused=False)
    fus = Focus(8, fused=True)
    variables = ref.init(jax.random.PRNGKey(5), x, train=False)

    def loss(params, module):
        v = {'params': params, 'batch_stats': variables['batch_stats']}
        return jnp.sum(module.apply(v, x, train=False) ** 2)

    g_ref = jax.grad(loss)(variables['params'], ref)
    g_fus = jax.grad(loss)(variables['params'], fus)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_detector_forward_unchanged_by_fusion():
    """Whole-detector outputs are identical with fused and unfused stems
    for the same parameters (bf16 tolerance)."""
    from stereotracking_tpu.models.detector import (DetectorConfig,
                                                    YOLOXDetector)
    import stereotracking_tpu.models.layers as layers_mod

    rng = np.random.RandomState(6)
    h, w = 64, 96
    inputs = {
        'img': jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32)),
        'disp_postp': jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32)),
        'disp_mask': jnp.ones((1, h, w, 1), jnp.float32),
    }
    det = YOLOXDetector(DetectorConfig())
    variables = det.init(jax.random.PRNGKey(7), inputs, train=False)
    out_fused = det.apply(variables, inputs, train=False)

    orig = Focus.fused
    try:
        Focus.fused = False
        det_ref = YOLOXDetector(DetectorConfig())
        out_ref = det_ref.apply(variables, inputs, train=False)
    finally:
        Focus.fused = orig
    for a, b in zip(jax.tree.leaves(out_fused), jax.tree.leaves(out_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
