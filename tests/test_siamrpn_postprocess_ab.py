"""A/B the SiamRPN penalty/window argmax postprocess against an
independent numpy transcription over random score/reg maps (reference
siamese_rpn_head.py get_bbox semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.sot.siamrpn import (SiamRPNTestCfg,
                                                   hanning_window,
                                                   siamese_rpn_anchors,
                                                   siamrpn_postprocess)


def np_postprocess(cls_score, bbox_pred, bbox, z_size, anchors, window,
                   cfg, img_hw):
    h_img, w_img = img_hw
    scale_factor = cfg.exemplar_size / z_size
    n, h, w, _ = cls_score.shape
    cls = cls_score.reshape(h * w, 2, 5).transpose(0, 2, 1).reshape(-1, 2)
    e = np.exp(cls - cls.max(axis=1, keepdims=True))
    score = (e / e.sum(axis=1, keepdims=True))[:, 1]
    reg = bbox_pred.reshape(h * w, 4, 5).transpose(0, 2, 1).reshape(-1, 4)
    # delta decode (anchor cx,cy,w,h convention, xyxy out, center origin)
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    cx = reg[:, 0] * aw + ax
    cy = reg[:, 1] * ah + ay
    bw = np.exp(reg[:, 2]) * aw
    bh = np.exp(reg[:, 3]) * ah

    def change(r):
        return np.maximum(r, 1.0 / r)

    def enlarge(wd, ht):
        pad = (wd + ht) * 0.5
        return np.sqrt((wd + pad) * (ht + pad))

    s_pen = change(enlarge(bw, bh) / enlarge(bbox[2] * scale_factor,
                                             bbox[3] * scale_factor))
    r_pen = change((bbox[2] / bbox[3]) / (bw / bh))
    penalty = np.exp(-(r_pen * s_pen - 1) * cfg.penalty_k)
    pscore = penalty * score
    pscore = pscore * (1 - cfg.window_influence) \
        + window * cfg.window_influence
    best = int(pscore.argmax())
    lr = penalty[best] * score[best] * cfg.lr
    ncx = cx[best] / scale_factor + bbox[0]
    ncy = cy[best] / scale_factor + bbox[1]
    nw = bbox[2] * (1 - lr) + (bw[best] / scale_factor) * lr
    nh = bbox[3] * (1 - lr) + (bh[best] / scale_factor) * lr
    return np.array([np.clip(ncx, 0, w_img), np.clip(ncy, 0, h_img),
                     np.clip(nw, 10, w_img), np.clip(nh, 10, h_img)]), \
        score[best]


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_siamrpn_postprocess_matches_numpy(seed):
    cfg = SiamRPNTestCfg()
    feat = 25                                  # canonical score-map size
    anchors = siamese_rpn_anchors(feat, 8)
    window = hanning_window(feat, 5)
    rng = np.random.RandomState(seed)
    cls = rng.randn(1, feat, feat, 10).astype(np.float32)
    reg = (rng.randn(1, feat, feat, 20) * 0.2).astype(np.float32)
    bbox = np.asarray([200.0 + 30 * rng.rand(), 150.0, 40.0 + 20
                       * rng.rand(), 55.0], np.float32)
    z_size = np.sqrt((bbox[2] + 0.5 * (bbox[2] + bbox[3]))
                     * (bbox[3] + 0.5 * (bbox[2] + bbox[3])))
    got_b, got_s = siamrpn_postprocess(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(bbox),
        jnp.asarray(z_size), jnp.asarray(anchors), jnp.asarray(window),
        cfg, (480, 640))
    ref_b, ref_s = np_postprocess(cls.astype(np.float64),
                                  reg.astype(np.float64),
                                  bbox.astype(np.float64),
                                  float(z_size), anchors, window, cfg,
                                  (480, 640))
    np.testing.assert_allclose(np.asarray(got_b), ref_b, rtol=1e-4,
                               atol=1e-3)
    assert abs(float(got_s) - ref_s) < 1e-4
