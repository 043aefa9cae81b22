"""Two-stage detector core: RoIAlign numpy oracle, anchor generation,
delta coder, MaxIoU assignment, SELSA aggregator oracle, RPN proposal
shapes (reference: mmdet semantics used by mmtrack VID/VIS families)."""
import jax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.models.two_stage import (
    SelsaAggregator, TwoStageConfig, bbox2delta, delta2bbox, iou_matrix,
    max_iou_assign, rpn_proposals, standard_anchors)
from stereotracking_tpu.ops.roi_align import roi_align


def roi_align_oracle(feat, rois, out, scale, ratio):
    """Brute-force mmcv RoIAlign(aligned=True)."""
    h, w, c = feat.shape

    def bilinear(y, x):
        if y <= -1.0 or y >= h or x <= -1.0 or x >= w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1.0)
        x = min(max(x, 0.0), w - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        fy, fx = y - y0, x - x0
        return (feat[y0, x0] * (1 - fy) * (1 - fx)
                + feat[y0, x1] * (1 - fy) * fx
                + feat[y1, x0] * fy * (1 - fx)
                + feat[y1, x1] * fy * fx)

    res = np.zeros((len(rois), out, out, c))
    for ri, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale - 0.5
        bw, bh = (x2 - x1) / out, (y2 - y1) / out
        for by in range(out):
            for bx in range(out):
                acc = np.zeros(c)
                for sy in range(ratio):
                    for sx in range(ratio):
                        yy = y1 + (by + (sy + 0.5) / ratio) * bh
                        xx = x1 + (bx + (sx + 0.5) / ratio) * bw
                        acc += bilinear(yy, xx)
                res[ri, by, bx] = acc / ratio ** 2
    return res


def test_roi_align_matches_oracle():
    rng = np.random.RandomState(0)
    feat = rng.rand(12, 16, 3).astype(np.float32)
    rois = np.array([[8., 8., 60., 40.],
                     [0., 0., 100., 100.],
                     [-10., -10., 30., 30.],       # partially out of bounds
                     [50., 30., 58., 38.]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 7,
                               spatial_scale=0.25, sampling_ratio=2))
    want = roi_align_oracle(feat, rois, 7, 0.25, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_standard_anchor_values():
    a = standard_anchors(2, 3, 16, (8,), (1.0,))
    assert a.shape == (2 * 3 * 1, 4)
    # first anchor: 128x128 centered at (0, 0)
    np.testing.assert_allclose(a[0], [-64, -64, 64, 64])
    # spatial-major row-major: second anchor shifted by stride in x
    np.testing.assert_allclose(a[1], [-48, -64, 80, 64])
    np.testing.assert_allclose(a[3], [-64, -48, 64, 80])


def test_delta_coder_roundtrip_with_stds():
    rng = np.random.RandomState(1)
    priors = jnp.asarray(rng.rand(20, 2).repeat(2, 1) * 100
                         + np.array([0, 0, 30, 40]), jnp.float32)
    gt = priors + jnp.asarray(rng.randn(20, 4) * 3, jnp.float32)
    stds = (0.1, 0.1, 0.2, 0.2)
    rec = delta2bbox(priors, bbox2delta(priors, gt, stds), stds)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=1e-3)


def test_max_iou_assign_semantics():
    priors = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                          [100, 100, 110, 110], [21, 21, 30, 30]],
                         jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    assigned, max_iou = max_iou_assign(priors, gts, jnp.ones(2, bool),
                                       pos_thr=0.7, neg_thr=0.3)
    a = np.asarray(assigned)
    assert a[0] == 1 and a[1] == 2        # exact hits -> gt index + 1
    assert a[2] == 0                      # far away -> negative
    # invalid gt swallows nothing
    assigned2, _ = max_iou_assign(priors, gts,
                                  jnp.asarray([True, False]), 0.7, 0.3)
    assert np.asarray(assigned2)[1] == 0


def test_selsa_aggregator_matches_numpy_oracle():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    ref = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    agg = SelsaAggregator(32, num_blocks=4)
    v = agg.init(jax.random.PRNGKey(0), x, ref)
    got = np.asarray(agg.apply(v, x, ref))

    p = jax.tree_util.tree_map(np.asarray, v['params'])

    def lin(name, inp):
        return inp @ p[name]['kernel'] + p[name]['bias']

    xe = lin('fc_embed', np.asarray(x)).reshape(4, 4, 8).transpose(1, 0, 2)
    re = lin('ref_fc_embed', np.asarray(ref)).reshape(6, 4, 8) \
        .transpose(1, 2, 0)
    w = (xe @ re) / np.sqrt(8)
    w = np.exp(w - w.max(axis=2, keepdims=True))
    w = w / w.sum(axis=2, keepdims=True)
    rn = lin('ref_fc', np.asarray(ref)).reshape(6, 4, 8).transpose(1, 0, 2)
    out = (w @ rn).transpose(1, 0, 2).reshape(4, 32)
    want = lin('fc', out)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_selsa_ref_mask_excludes_padded_refs():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 32).astype(np.float32))
    ref = jnp.asarray(rng.randn(5, 32).astype(np.float32))
    agg = SelsaAggregator(32, num_blocks=4)
    v = agg.init(jax.random.PRNGKey(1), x, ref)
    # masking the last 2 refs == dropping them
    got_masked = agg.apply(v, x, ref,
                           jnp.asarray([True, True, True, False, False]))
    got_dropped = agg.apply(v, x, ref[:3], jnp.ones(3, bool))
    np.testing.assert_allclose(np.asarray(got_masked),
                               np.asarray(got_dropped), atol=1e-5)


def test_rpn_proposals_fixed_shape():
    rng = np.random.RandomState(4)
    cfg = TwoStageConfig(num_proposals=16, rpn_nms_pre=64)
    h, w = 8, 10
    anchors = jnp.asarray(standard_anchors(h, w, 16, cfg.anchor_scales,
                                           cfg.anchor_ratios))
    a = len(cfg.anchor_scales) * len(cfg.anchor_ratios)
    cls = jnp.asarray(rng.randn(h, w, a).astype(np.float32))
    reg = jnp.asarray(rng.randn(h, w, a * 4).astype(np.float32) * 0.1)
    boxes, scores, valid = rpn_proposals(cls, reg, anchors, (128, 160), cfg)
    assert boxes.shape == (16, 4) and valid.shape == (16,)
    b = np.asarray(boxes)[np.asarray(valid).astype(bool)]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 160).all()
    assert (b[:, 1] >= 0).all() and (b[:, 3] <= 128).all()


def test_faster_rcnn_training_reduces_loss():
    """A few SGD steps on one synthetic image must reduce the combined
    RPN+RCNN loss (the two-stage train path VID models rely on)."""
    import optax
    from stereotracking_tpu.models.two_stage import (FasterRCNN,
                                                     faster_rcnn_train_step_fn)

    cfg = TwoStageConfig(num_classes=3, num_proposals=32, rpn_nms_pre=64,
                         rcnn_max_per_img=8)
    module = FasterRCNN(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), img)
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}
    batch = dict(
        img=img,
        gt_bboxes=jnp.asarray([[10., 10., 50., 40.],
                               [60., 20., 90., 55.]]),
        gt_labels=jnp.asarray([0, 2]),
        gt_valid=jnp.ones(2, bool))

    loss_fn = faster_rcnn_train_step_fn(module, cfg)
    tx = optax.sgd(1e-3, momentum=0.9)
    opt = tx.init(params)

    @jax.jit
    def step(params, rest, opt, key):
        (total, (losses, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, rest, batch, key)
        upd, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, upd)
        rest = {**rest, **updates}
        return params, rest, opt, total, losses

    totals = []
    for i in range(6):
        params, rest, opt, total, losses = step(
            params, rest, opt, jax.random.PRNGKey(7))  # fixed sampling
        totals.append(float(total))
        assert np.isfinite(totals[-1])
    assert totals[-1] < totals[0], totals
    assert {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls',
            'loss_bbox'} <= set(losses)
