"""Mask2Former VIS: Hungarian loss + video prediction on synthetic head
outputs (fast), full-module forward env-gated (compile-heavy).
Reference: mmtrack/models/track_heads/mask2former_head.py."""
import os

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


def _fake_outputs(rng, q=8, t=2, h=16, w=24, layers=2):
    cls_list = [jnp.asarray(rng.randn(q, CFG.num_classes + 1), jnp.float32)
                for _ in range(layers)]
    mask_list = [jnp.asarray(rng.randn(q, t, h, w), jnp.float32)
                 for _ in range(layers)]
    return cls_list, mask_list


def test_predict_query_ids_are_instance_ids():
    rng = np.random.RandomState(0)
    cls_list, mask_list = _fake_outputs(rng)
    out = mask2former_predict(cls_list[-1], mask_list[-1], CFG)
    assert out['masks'].shape == (4, 2, 16, 24)
    assert out['labels'].shape == (4,)
    ids = np.asarray(out['instances_id'])
    assert ((ids >= 0) & (ids < CFG.num_queries)).all()
    s = np.asarray(out['scores'])
    assert (np.diff(s) <= 1e-6).all()


def test_loss_structure_and_finite():
    rng = np.random.RandomState(1)
    cls_list, mask_list = _fake_outputs(rng)
    gt_masks = jnp.zeros((2, 2, 16, 24)).at[0, :, :8, :8].set(1) \
        .at[1, :, 8:, 8:].set(1)
    losses = mask2former_loss(cls_list, mask_list, jnp.asarray([1, 2]),
                              gt_masks, jnp.ones(2, bool), CFG)
    assert 'loss_cls' in losses and 'loss_cls.d0' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())


def test_loss_gradients_flow():
    rng = np.random.RandomState(2)
    cls_list, mask_list = _fake_outputs(rng, layers=1)
    gt_masks = jnp.zeros((1, 2, 16, 24)).at[0, :, :8, :8].set(1)

    def total(c, m):
        d = mask2former_loss([c], [m], jnp.asarray([1]), gt_masks,
                             jnp.ones(1, bool), CFG)
        return sum(d.values())

    val, grads = jax.value_and_grad(total, argnums=(0, 1))(
        cls_list[0], mask_list[0])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)


def test_loss_prefers_correct_classification():
    q = 4
    mask = jnp.zeros((q, 1, 8, 8)).at[0, :, :4, :4].set(10.0) - 5.0
    gt_masks = jnp.zeros((1, 1, 8, 8)).at[0, :, :4, :4].set(1)
    good_cls = jnp.full((q, CFG.num_classes + 1), -5.0) \
        .at[:, CFG.num_classes].set(5.0).at[0, 1].set(6.0)
    bad_cls = jnp.full((q, CFG.num_classes + 1), -5.0) \
        .at[:, CFG.num_classes].set(5.0).at[0, 3].set(6.0)
    l_good = mask2former_loss([good_cls], [mask], jnp.asarray([1]),
                              gt_masks, jnp.ones(1, bool), CFG)
    l_bad = mask2former_loss([bad_cls], [mask], jnp.asarray([1]),
                             gt_masks, jnp.ones(1, bool), CFG)
    assert float(l_good['loss_cls']) < float(l_bad['loss_cls'])


@pytest.mark.skipif(os.environ.get('STTPU_SLOW_TESTS') != '1',
                    reason='full ResNet-50 module forward is compile-heavy')
def test_module_forward_shapes():
    m = Mask2FormerVIS(CFG)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 3),
                       jnp.float32)
    v = m.init(jax.random.PRNGKey(0), imgs)
    cls_list, mask_list = m.apply(v, imgs)
    assert len(cls_list) == CFG.num_decoder_layers + 1
    assert cls_list[-1].shape == (CFG.num_queries, CFG.num_classes + 1)
    assert mask_list[-1].shape == (CFG.num_queries, 2, 16, 24)
