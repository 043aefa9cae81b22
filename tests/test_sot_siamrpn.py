"""SiamRPN++ SOT stack: anchor algebra, crop/resize gather, delta coder,
target sampling and loss (reference semantics:
mmtrack/models/track_heads/siamese_rpn_head.py,
mmtrack/models/task_modules/anchor/sot_anchor_generator.py,
mmtrack/models/sot/siamrpn.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.models.sot import (
    SiamRPNTrainCfg, crop_resize, hanning_window, siamese_rpn_anchors,
    siamrpn_loss, siamrpn_targets)
from stereotracking_tpu.models.sot.siamrpn import delta_decode, delta_encode


def test_anchor_base_sizes_match_truncating_arithmetic():
    """ws = floor(8/sqrt(r))*8, hs = floor(8*sqrt(r))*8 for the canonical
    ratios — including the .long() truncation (sot_anchor_generator.py:87)."""
    a = siamese_rpn_anchors(25)
    assert a.shape == (25 * 25 * 5, 4)
    center = a[(12 * 25 + 12) * 5:(12 * 25 + 12) * 5 + 5]
    ws = center[:, 2] - center[:, 0]
    hs = center[:, 3] - center[:, 1]
    np.testing.assert_array_equal(ws, [104, 88, 64, 40, 32])
    np.testing.assert_array_equal(hs, [32, 40, 64, 88, 104])
    # centered at the origin
    np.testing.assert_array_equal(center[:, 0] + center[:, 2], np.zeros(5))
    np.testing.assert_array_equal(center[:, 1] + center[:, 3], np.zeros(5))


def test_hanning_window_order_and_range():
    w = hanning_window(25, 5)
    assert w.shape == (25 * 25 * 5,)
    # anchor-minor: 5 consecutive entries are equal
    assert np.allclose(w[:5], w[0])
    # peak at the center cell
    assert np.argmax(w) // 5 == 12 * 25 + 12


def test_crop_resize_identity_and_padding():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(40, 50, 3).astype(np.float32))
    pad = jnp.asarray([9., 9., 9.])
    # odd crop size centered on an integer pixel -> pure copy
    out = crop_resize(img, jnp.asarray([25., 20.]), jnp.asarray(10.), 11,
                      pad)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(img[15:26, 20:31]), atol=1e-5)
    # fully outside the image -> pad value everywhere
    out2 = crop_resize(img, jnp.asarray([-100., -100.]), jnp.asarray(10.),
                       11, pad)
    np.testing.assert_allclose(np.asarray(out2), 9.0, atol=1e-5)


def test_delta_coder_roundtrip():
    anchors = jnp.asarray(siamese_rpn_anchors(25)[:50])
    gt = jnp.asarray([10., -20., 90., 44.])
    dec = delta_decode(anchors, delta_encode(anchors, gt))
    np.testing.assert_allclose(np.asarray(dec),
                               np.tile(np.asarray(gt), (50, 1)), atol=1e-3)


def test_positive_pair_targets():
    cfg = SiamRPNTrainCfg()
    # gt on an anchor-friendly square at the search center
    gt = jnp.asarray([127.5 - 32, 127.5 - 32, 127.5 + 32, 127.5 + 32])
    labels, lw, bt, bw = siamrpn_targets(gt, jnp.asarray(1),
                                         jax.random.PRNGKey(0), cfg)
    labels = np.asarray(labels)
    lw = np.asarray(lw)
    n_pos = int((labels == 1).sum())
    assert 1 <= n_pos <= 16
    # cls weights: positives sum to 0.5, negatives sum to 0.5
    assert abs(lw[labels == 1].sum() - 0.5) < 1e-5
    assert abs(lw.sum() - 1.0) < 1e-5
    # bbox weights only where positive, summing to 4 * ... per-row 1/n_pos
    bw = np.asarray(bw)
    assert (bw[labels == 0] == 0).all()
    assert abs(bw[:, 0].sum() - 1.0) < 1e-5
    # encoded targets decode back to the gt at positive anchors
    anchors = jnp.asarray(siamese_rpn_anchors(25)) + 127
    pos_idx = np.flatnonzero(labels == 1)
    dec = delta_decode(anchors[pos_idx], jnp.asarray(bt)[pos_idx])
    np.testing.assert_allclose(np.asarray(dec),
                               np.tile(np.asarray(gt), (n_pos, 1)),
                               atol=1e-3)


def test_negative_pair_targets():
    gt = jnp.asarray([100., 100., 160., 160.])
    labels, lw, bt, bw = siamrpn_targets(gt, jnp.asarray(0),
                                         jax.random.PRNGKey(1))
    labels = np.asarray(labels)
    lw = np.asarray(lw)
    # the reference's final labels[...] = 0 (siamese_rpn_head.py:380)
    assert (labels == 0).all()
    assert (np.asarray(bw) == 0).all()
    n_sel = int((lw > 0).sum())
    assert 1 <= n_sel <= 16
    assert abs(lw.sum() - 0.5) < 1e-5


def test_loss_runs_and_differentiates():
    rng = np.random.RandomState(2)
    cls = jnp.asarray(rng.randn(2, 25, 25, 10).astype(np.float32))
    reg = jnp.asarray(rng.randn(2, 25, 25, 20).astype(np.float32))
    gts = jnp.asarray([[100., 100., 160., 170.], [90., 110., 150., 150.]])
    is_pos = jnp.asarray([1, 0])

    def total(c, r):
        d = siamrpn_loss(c, r, gts, is_pos, jax.random.PRNGKey(3))
        return d['loss_rpn_cls'] + d['loss_rpn_bbox']

    val, grads = jax.value_and_grad(total, argnums=(0, 1))(cls, reg)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    # negative pair contributes no bbox loss; zeroing its reg rows is a no-op
    d = siamrpn_loss(cls, reg.at[1].set(0), gts, is_pos,
                     jax.random.PRNGKey(3))
    d2 = siamrpn_loss(cls, reg, gts, is_pos, jax.random.PRNGKey(3))
    assert abs(float(d['loss_rpn_bbox'] - d2['loss_rpn_bbox'])) < 1e-5
