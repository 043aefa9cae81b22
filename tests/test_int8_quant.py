"""Int8 quantized inference: math correctness, param-tree compatibility,
and a detector-level error bound vs the bf16/f32 path.

The quantized path (layers.quantized_conv + ConvBNAct(quant=...)) is an
inference-mode evaluation of the SAME canonical parameters: dynamic
per-tensor activation scale, per-output-channel weight scales, s8 x s8 ->
s32 accumulate. 'sim8' evaluates identical quantize-round-rescale math in
float for backends without s8 convs.
"""
import jax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.models.layers import ConvBNAct, quantized_conv


def _ref_quant_conv(x, w, strides, padding):
    """Independent numpy reference of the quantization scheme."""
    import jax.lax as lax
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    sx = max(np.abs(x).max(), 1e-6) / 127.0
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127)
    wq = np.clip(np.round(w / sw), -127, 127)
    y = lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(wq, jnp.float32),
        strides, padding, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return np.asarray(y, np.float64) * (sx * sw)


def test_quantized_conv_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8) * 3, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.1, jnp.float32)
    for mode in ('int8', 'sim8'):
        y = quantized_conv(x, w, (1, 1), 'SAME', mode=mode)
        ref = _ref_quant_conv(x, w, (1, 1), 'SAME')
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_int8_equals_sim8():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 12, 16) * 2, jnp.float32)
    w = jnp.asarray(rng.randn(1, 1, 16, 32) * 0.2, jnp.float32)
    a = quantized_conv(x, w, (1, 1), [(0, 0), (0, 0)], mode='int8')
    b = quantized_conv(x, w, (1, 1), [(0, 0), (0, 0)], mode='sim8')
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_quantized_conv_error_bound():
    """Per-tensor dynamic int8 keeps elementwise error within the
    quantization step of the scheme (|x|max/127 per operand)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 16, 32), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 32, 32) * 0.05, jnp.float32)
    import jax.lax as lax
    exact = lax.conv_general_dilated(
        x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    q = quantized_conv(x, w, (1, 1), 'SAME', mode='int8')
    rel = (jnp.abs(q - exact).max()
           / jnp.abs(exact).max()).item()
    assert rel < 0.02, rel


def test_quant_param_tree_identical():
    """quant and non-quant ConvBNAct share one parameter tree, so the same
    trained variables drop into either evaluation."""
    m0 = ConvBNAct(16, 3, strides=2)
    m1 = ConvBNAct(16, 3, strides=2, quant='int8')
    x = jnp.zeros((1, 8, 8, 4))
    v0 = m0.init(jax.random.PRNGKey(0), x)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape


def test_quant_convbnact_close_to_exact():
    """ConvBNAct(quant) output stays close to the exact conv output
    through BN+SiLU, for the plain mode and a folded conv_mode."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)
    m = ConvBNAct(16, 3, strides=2)
    mq = ConvBNAct(16, 3, strides=2, quant='int8')
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    yq = mq.apply(v, x)
    err = float(jnp.abs(y - yq).max() / (jnp.abs(y).max() + 1e-9))
    assert err < 0.05, err

    # folded evaluation ('fold': W-folded in/out 3x3) under quant
    xf = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)  # folded 2*8ch
    mf = ConvBNAct(8, 3, strides=1)
    mfq = ConvBNAct(8, 3, strides=1, quant='int8')
    vf = mf.init(jax.random.PRNGKey(2), xf, conv_mode='fold')
    yf = mf.apply(vf, xf, conv_mode='fold')
    yfq = mfq.apply(vf, xf, conv_mode='fold')
    err = float(jnp.abs(yf - yfq).max() / (jnp.abs(yf).max() + 1e-9))
    assert err < 0.05, err


def test_detector_quant_feature_error_and_train_noop():
    """Backbone+neck in int8: feature maps stay within a few percent of
    the bf16-exact evaluation on a detector-scale module, and train mode
    ignores quant entirely (canonical convs, identical outputs)."""
    from stereotracking_tpu.models.detector import (DetectorConfig,
                                                    YOLOXDetector)
    cfg = DetectorConfig(num_classes=1, widen_factor=0.25)
    det = YOLOXDetector(cfg)
    detq = YOLOXDetector(cfg._replace(quant='int8'))
    rng = np.random.RandomState(0)
    inputs = {
        'img': jnp.asarray(rng.rand(1, 64, 96, 3) * 255, jnp.float32),
        'disp_postp': jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32),
        'disp_mask': jnp.ones((1, 64, 96, 1), jnp.float32)}
    v = det.init(jax.random.PRNGKey(0), inputs)
    out = det.apply(v, inputs)
    outq = detq.apply(v, inputs)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(outq)):
        denom = float(jnp.abs(a).max()) + 1e-9
        rel = float(jnp.abs(a - b).max()) / denom
        assert rel < 0.15, rel

    # train mode: quant config must be a no-op (exact same program)
    t0 = det.apply(v, inputs, train=True,
                   mutable=['batch_stats'])[0]
    t1 = detq.apply(v, inputs, train=True,
                    mutable=['batch_stats'])[0]
    for a, b in zip(jax.tree_util.tree_leaves(t0),
                    jax.tree_util.tree_leaves(t1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
