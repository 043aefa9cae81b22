"""Misc utilities: image ops, DA plumbing, completion training step."""
import jax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.utils.image import (crop_image, gauss_blur,
                                            imrenormalize)
from stereotracking_tpu.data.domain_adaptation import (
    multi_dataset_collate, teacher_student_evaluate)
from stereotracking_tpu.train.train_completion import (CompletionConfig,
                                                       completion_loss_fn,
                                                       make_disp_cutout)
from stereotracking_tpu.models.detector import DetectorConfig
from stereotracking_tpu.models.disp_completion import YOLOXDisp
from stereotracking_tpu.train.losses import YOLOXLossConfig


def test_crop_image_pads_out_of_bounds():
    img = np.arange(36, dtype=np.uint8).reshape(6, 6)
    out = crop_image(img, [-2, -2, 3, 3], pad_value=0)
    assert out.shape == (5, 5)
    assert out[0, 0] == 0 and out[2, 2] == img[0, 0]


def test_imrenormalize_roundtrip():
    img = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    out = imrenormalize(img, old_mean=0.0, old_std=1.0, new_mean=0.5,
                        new_std=2.0)
    back = imrenormalize(out, old_mean=0.5, old_std=2.0, new_mean=0.0,
                         new_std=1.0)
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_gauss_blur_smooths():
    img = np.zeros((9, 9), np.float32)
    img[4, 4] = 1.0
    out = gauss_blur(img, sigma=1.0)
    assert out[4, 4] < 1.0 and out[4, 3] > 0


def test_da_collate_and_teacher_student():
    batch = multi_dataset_collate([{'a': 1}], [{'b': 2}])
    assert set(batch) == {'src', 'tar'}
    res = teacher_student_evaluate(lambda v: {'mAP': v['x']},
                                   {'x': 1.0}, {'x': 2.0})
    assert res['student']['mAP'] == 1.0 and res['teacher']['mAP'] == 2.0


def test_make_disp_cutout_zeroes_valid_cut_pixels():
    disp = jnp.ones((1, 8, 8, 3)) * 5.0
    mask = jnp.ones((1, 8, 8, 1))
    cut = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)
    out = make_disp_cutout(disp, mask, cut)
    assert float(out[0, 0, 0, 0]) == 0.0
    assert float(out[0, 7, 0, 0]) == 5.0


def test_completion_loss_runs_and_is_finite():
    # tiny deepen/widen: the assertion targets the loss plumbing, and the
    # full-size backbone costs ~2 min of CPU compile per suite run
    cfg = DetectorConfig(deepen_factor=0.1, widen_factor=0.125)
    module = YOLOXDisp(cfg=cfg, head_channels=16)
    h, w, g = 64, 96, 4
    rng = np.random.RandomState(0)
    batch = {
        'img': jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) * 255),
        'disp_postp': jnp.asarray(
            rng.rand(1, h, w, 3).astype(np.float32) * 40),
        'disp_mask': jnp.ones((1, h, w, 1)),
        'disp_cut_mask': jnp.asarray(
            (rng.rand(1, h, w, 1) < 0.3).astype(np.float32)),
        'gt_bboxes': jnp.asarray(
            np.array([[[10, 10, 40, 30]] * g], np.float32)),
        'gt_labels': jnp.zeros((1, g), jnp.int32),
        'gt_valid': jnp.asarray(np.arange(g)[None] < 1),
    }
    variables = module.init(jax.random.PRNGKey(0),
                            {'img': batch['img'],
                             'disp_postp': batch['disp_postp'],
                             'disp_mask': batch['disp_mask']}, train=True)
    total, (losses, _) = completion_loss_fn(
        variables['params'], variables['batch_stats'], module, batch,
        YOLOXLossConfig(), CompletionConfig(train_bbox=True))
    assert np.isfinite(float(total))
    assert 'loss_disp' in losses and 'loss_bbox' in losses
    # frozen-bbox stage excludes the detection terms
    total2, (losses2, _) = completion_loss_fn(
        variables['params'], variables['batch_stats'], module, batch,
        YOLOXLossConfig(), CompletionConfig(train_bbox=False))
    assert 'loss_bbox' not in losses2


def test_reid_embedding_and_losses():
    from stereotracking_tpu.models.reid import BaseReID, reid_losses
    m = BaseReID(embed_dim=64, num_classes=5, widen_factor=0.125)
    crops = jnp.asarray(
        np.random.RandomState(0).rand(4, 64, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), crops, train=False)
    emb, logits = m.apply(v, crops, train=False)
    assert emb.shape == (4, 64) and logits.shape == (4, 5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               atol=1e-5)
    losses = reid_losses(emb, logits, jnp.asarray([0, 0, 1, 2]))
    assert np.isfinite(float(losses['loss']))
