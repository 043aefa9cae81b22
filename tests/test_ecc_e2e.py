"""ECC camera-motion compensation driven end-to-end through Tracktor.

The reference composes Tracktor with ``CameraMotionCompensation``
(/root/reference/mmtrack/models/mot/tracktor.py:49-64 +
trackers/tracktor_tracker.py:179-185): previous-frame track boxes are
ECC-warped into the current frame before RoI regression.  Here a synthetic
panning sequence quantifies the association benefit: with CMC the
propagated box lands on the panned object (IoU high, id kept by the
regression gate); without, the accumulated pan leaves the stale box
off-target.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np
import pytest

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

cv2 = pytest.importorskip('cv2')


def _scene(pan_x, h=128, w=192, seed=7):
    """Textured background panned by ``pan_x`` with one object riding it."""
    rng = np.random.RandomState(seed)
    base = cv2.resize(rng.rand(h // 8, w // 8, 3).astype(np.float32),
                      (w, h), interpolation=cv2.INTER_CUBIC)
    H = np.array([[1.0, 0.0, pan_x], [0.0, 1.0, 0.0]], np.float32)
    img = cv2.warpAffine(base, H, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)
    box = np.array([40.0 + pan_x, 50.0, 70.0 + pan_x, 90.0], np.float32)
    x1, y1, x2, y2 = box.astype(int)
    img[y1:y2, x1:x2] = 0.9                      # bright object on the pan
    return (img * 255).astype(np.float32), box


def _iou(a, b):
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    ua = ((a[2] - a[0]) * (a[3] - a[1]) +
          (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / max(ua, 1e-9)


@pytest.mark.parametrize('use_cmc', [True, False])
def test_ecc_compensation_improves_propagation(use_cmc):
    from stereotracking_tpu.apis.builder import build_motion
    from stereotracking_tpu.config import load_config
    from stereotracking_tpu.models.reid import BaseReID
    from stereotracking_tpu.models.tracktor import (TracktorConfig,
                                                    TracktorStreaming)
    from stereotracking_tpu.models.two_stage import (FasterRCNN,
                                                     TwoStageConfig)

    det_cfg = TwoStageConfig(num_classes=1, anchor_scales=(4, 8),
                             rpn_nms_pre=64, num_proposals=16,
                             rcnn_max_per_img=8)
    fr = FasterRCNN(det_cfg)
    fv = fr.init(jax.random.PRNGKey(2), jnp.zeros((1, 128, 192, 3)))
    reid = BaseReID(embed_dim=32, num_classes=1)
    rv = reid.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 16, 3)))
    cfg = TracktorConfig(num_slots=8, embed_dim=32, num_samples=3)

    model_cfg = load_config(
        'configs/mot/tracktor/tracktor_frcnn_ecc.py')['model']
    cmc = build_motion(model_cfg['motion']) if use_cmc else None
    assert (cmc is not None) == use_cmc
    tr = TracktorStreaming(fv, rv, det_cfg, cfg, input_shape=(128, 192),
                           reid_hw=(32, 16), num_dets=8, cmc=cmc)

    # isolate the CMC contribution: regression returns its input box
    # (score 0.9) so the propagated position is exactly what CMC produced;
    # detection is stubbed to the ground-truth panned box.
    gt = {}

    def fake_regress(feat, boxes):
        return boxes, jnp.full((boxes.shape[0],), 0.9)

    def fake_detect(variables, img):
        db = jnp.zeros((8, 4)).at[0].set(jnp.asarray(gt['box']))
        ds = jnp.zeros((8,)).at[0].set(0.95)
        dl = jnp.zeros((8,), jnp.int32)
        dv = jnp.zeros((8,), bool).at[0].set(True)
        feat = jnp.zeros((1, 8, 12, 2048))
        return feat, (db, ds, dl, dv)

    tr._regress = fake_regress
    tr._detect = fake_detect

    pans = [0.0, 10.0, 20.0]
    boxes_by_frame = []
    for f, pan in enumerate(pans):
        img, box = _scene(pan)
        gt['box'] = box
        out = tr.track(img[None], f)
        v = np.asarray(out['valid'])
        ids = np.asarray(out['instances_id'])[v]
        bxs = np.asarray(out['bboxes'])[v]
        boxes_by_frame.append({int(i): b for i, b in zip(ids, bxs)})

    # the frame-0 track must exist in later frames; its propagated box
    # should sit on the panned object IFF cmc is on
    tid = list(boxes_by_frame[0])[0]
    _, gt_box2 = _scene(pans[2])
    assert tid in boxes_by_frame[2], boxes_by_frame
    iou = _iou(boxes_by_frame[2][tid], gt_box2)
    if use_cmc:
        assert iou > 0.7, iou
    else:
        assert iou < 0.3, iou
