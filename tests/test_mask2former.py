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


def test_point_sample_matches_torch_grid_sample():
    """mmcv point_sample == grid_sample(2*coords-1, align_corners=False)."""
    import torch

    from stereotracking_tpu.models.vis.mask2former import point_sample

    rng = np.random.RandomState(3)
    masks = rng.randn(3, 2, 9, 13).astype(np.float32)   # (Q, T, H, W)
    pts = rng.rand(40, 2).astype(np.float32)

    out = point_sample(jnp.asarray(masks), jnp.asarray(pts))

    t_in = torch.from_numpy(masks)
    grid = torch.from_numpy(pts)[None, :, None, :] * 2 - 1  # (1, P, 1, 2)
    ref = torch.nn.functional.grid_sample(
        t_in, grid.expand(3, -1, -1, -1), mode='bilinear',
        padding_mode='zeros', align_corners=False)[..., 0]   # (Q, T, P)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_uncertain_point_coords_properties():
    from stereotracking_tpu.models.vis.mask2former import (
        point_sample, uncertain_point_coords)

    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(5, 12, 16) * 4, jnp.float32)
    pts = uncertain_point_coords(logits, jax.random.PRNGKey(0), 64,
                                 oversample_ratio=3.0,
                                 importance_sample_ratio=0.75)
    assert pts.shape == (5, 64, 2)
    assert (np.asarray(pts) >= 0).all() and (np.asarray(pts) <= 1).all()
    # the importance-sampled 75% must be more uncertain (|logit| smaller)
    # than random points on average
    vals = jax.vmap(point_sample)(logits, pts)
    unc = np.abs(np.asarray(vals[:, :48]))
    rnd = np.abs(np.asarray(vals[:, 48:]))
    assert unc.mean() < rnd.mean()


def test_msdeform_attn_matches_torch_reference():
    """MSDeformAttn == the standard pure-torch evaluation of multi-scale
    deformable attention (grid_sample per level, softmax-weighted sum)."""
    import torch

    from stereotracking_tpu.models.vis.mask2former import MSDeformAttn

    dim, heads, levels, points = 32, 4, 3, 4
    shapes = [(4, 6), (8, 12), (16, 24)]
    L = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(5)
    query = rng.randn(2, L, dim).astype(np.float32)
    value = rng.randn(2, L, dim).astype(np.float32)
    refs = []
    for h, w in shapes:
        ys, xs = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing='ij')
        refs.append(np.stack([xs.ravel(), ys.ravel()], -1))
    ref_pts = np.concatenate(refs, 0).astype(np.float32)

    mod = MSDeformAttn(dim, heads, levels, points)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(query),
                      jnp.asarray(value), jnp.asarray(ref_pts), shapes)
    out = mod.apply(params, jnp.asarray(query), jnp.asarray(value),
                    jnp.asarray(ref_pts), shapes)

    # independent torch evaluation with the same (converted) weights
    p = params['params']

    def lin(x, name):
        w = torch.from_numpy(np.asarray(p[name]['kernel']))
        b = torch.from_numpy(np.asarray(p[name]['bias']))
        return x @ w + b

    tq = torch.from_numpy(query)
    tv = lin(torch.from_numpy(value), 'value_proj')
    off = lin(tq, 'sampling_offsets').reshape(2, L, heads, levels,
                                              points, 2)
    aw = lin(tq, 'attention_weights').reshape(2, L, heads,
                                              levels * points)
    aw = torch.softmax(aw, -1).reshape(2, L, heads, levels, points)
    hd = dim // heads
    starts = np.concatenate([[0], np.cumsum([h * w for h, w in shapes])])
    acc = torch.zeros(2, L, heads, hd)
    for li, (h, w) in enumerate(shapes):
        vm = tv[:, starts[li]:starts[li + 1]].reshape(2, h, w, heads, hd)
        vm = vm.permute(0, 3, 4, 1, 2).reshape(2 * heads, hd, h, w)
        loc = torch.from_numpy(ref_pts)[None, :, None, None, :] + \
            off[:, :, :, li] / torch.tensor([w, h], dtype=torch.float32)
        grid = loc * 2 - 1                       # (2, L, heads, points, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(2 * heads, L, points, 2)
        samp = torch.nn.functional.grid_sample(
            vm, grid, mode='bilinear', padding_mode='zeros',
            align_corners=False)                 # (2*heads, hd, L, points)
        samp = samp.reshape(2, heads, hd, L, points).permute(0, 3, 1, 4, 2)
        acc = acc + (samp * aw[:, :, :, li, :, None]).sum(3)
    t_out = lin(acc.reshape(2, L, dim), 'output_proj')

    np.testing.assert_allclose(np.asarray(out), t_out.numpy(),
                               rtol=2e-4, atol=2e-4)
