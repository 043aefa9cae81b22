"""Mask2Former VIS: module forward, video prediction, Hungarian loss
(reference: mmtrack/models/track_heads/mask2former_head.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.vis import (Mask2FormerConfig, Mask2FormerVIS,
                                           mask2former_loss,
                                           mask2former_predict)

CFG = Mask2FormerConfig(num_classes=5, num_queries=8, embed_dim=64,
                        num_heads=4, num_decoder_layers=3, ffn_dim=128,
                        max_per_video=4)


@pytest.fixture(scope='module')
def model_and_out():
    m = Mask2FormerVIS(CFG)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 3),
                       jnp.float32)
    v = m.init(jax.random.PRNGKey(0), imgs)
    cls_list, mask_list = m.apply(v, imgs)
    return m, v, imgs, cls_list, mask_list


def test_forward_shapes(model_and_out):
    _, _, _, cls_list, mask_list = model_and_out
    # initial prediction + one per decoder layer
    assert len(cls_list) == CFG.num_decoder_layers + 1
    assert cls_list[-1].shape == (CFG.num_queries, CFG.num_classes + 1)
    # masks at stride 4 over BOTH frames
    assert mask_list[-1].shape == (CFG.num_queries, 2, 16, 24)


def test_predict_query_ids_are_instance_ids(model_and_out):
    _, _, _, cls_list, mask_list = model_and_out
    out = mask2former_predict(cls_list[-1], mask_list[-1], CFG)
    assert out['masks'].shape == (4, 2, 16, 24)
    assert out['labels'].shape == (4,)
    ids = np.asarray(out['instances_id'])
    assert ((ids >= 0) & (ids < CFG.num_queries)).all()
    # scores sorted descending
    s = np.asarray(out['scores'])
    assert (np.diff(s) <= 1e-6).all()


def test_loss_structure_and_grads(model_and_out):
    m, v, imgs, cls_list, mask_list = model_and_out
    mh, mw = mask_list[-1].shape[2], mask_list[-1].shape[3]
    gt_masks = jnp.zeros((2, 2, mh, mw)).at[0, :, :8, :8].set(1) \
        .at[1, :, 8:, 8:].set(1)
    gt_labels = jnp.asarray([1, 2])
    losses = mask2former_loss(cls_list, mask_list, gt_labels, gt_masks,
                              jnp.ones(2, bool), CFG)
    # final-layer keys + auxiliary per-layer keys
    assert 'loss_cls' in losses and 'loss_cls.d0' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())


def test_loss_prefers_correct_classification():
    """A prediction set whose matched query has the right class must have
    lower cls loss than one with the wrong class."""
    q, g = 4, 1
    mask = jnp.zeros((q, 1, 8, 8)).at[0, :, :4, :4].set(10.0) - 5.0
    gt_masks = jnp.zeros((g, 1, 8, 8)).at[0, :, :4, :4].set(1)
    good_cls = jnp.full((q, CFG.num_classes + 1), -5.0) \
        .at[:, CFG.num_classes].set(5.0).at[0, 1].set(6.0)
    bad_cls = jnp.full((q, CFG.num_classes + 1), -5.0) \
        .at[:, CFG.num_classes].set(5.0).at[0, 3].set(6.0)
    l_good = mask2former_loss([good_cls], [mask], jnp.asarray([1]),
                              gt_masks, jnp.ones(1, bool), CFG)
    l_bad = mask2former_loss([bad_cls], [mask], jnp.asarray([1]),
                             gt_masks, jnp.ones(1, bool), CFG)
    assert float(l_good['loss_cls']) < float(l_bad['loss_cls'])
