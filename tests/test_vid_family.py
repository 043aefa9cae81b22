"""VID family units: flow warping, flow-input prep, embed aggregator
semantics; (env-gated) full DFF/FGFA/SELSA streaming smoke.

Reference: mmtrack/models/task_modules/motion/flow.py,
mmtrack/models/aggregators/embed_aggregator.py,
mmtrack/models/vid/{dff,fgfa,selsa}.py."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereotracking_tpu.models.vid import (EmbedAggregator, FlowNetSimple,
                                           flow_warp_feats,
                                           prepare_flow_input)


def test_flow_warp_zero_flow_is_identity():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 10, 4), jnp.float32)
    w = flow_warp_feats(x, jnp.zeros((1, 8, 10, 2)))
    np.testing.assert_allclose(np.asarray(w), np.asarray(x), atol=1e-5)


def test_flow_warp_integer_shift():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 8, 10, 4), jnp.float32)
    flow = jnp.zeros((1, 8, 10, 2)).at[..., 0].set(1.0)   # dx = +1
    w = flow_warp_feats(x, flow)
    np.testing.assert_allclose(np.asarray(w[:, :, :-1]),
                               np.asarray(x[:, :, 1:]), atol=1e-5)


def test_flow_warp_resolution_scaling():
    """Flow at half resolution is resized AND its components scaled by the
    resolution ratio (flow.py:17-23)."""
    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 2), jnp.float32)
    # half-res flow of constant dx=0.5 -> dx=1.0 at feature res
    flow = jnp.zeros((1, 4, 4, 2)).at[..., 0].set(0.5)
    w = flow_warp_feats(x, flow)
    np.testing.assert_allclose(np.asarray(w[:, :, :-1]),
                               np.asarray(x[:, :, 1:]), atol=1e-4)


def test_prepare_flow_input_norm_and_scale():
    img = jnp.full((1, 8, 8, 3), 255.0)
    pair = prepare_flow_input(img, img * 0, img_scale_factor=0.5)
    assert pair.shape == (1, 4, 4, 6)
    p = np.asarray(pair)
    np.testing.assert_allclose(p[0, 0, 0, :3], 1.0 - np.array(
        [0.411, 0.432, 0.450]), atol=1e-5)
    np.testing.assert_allclose(p[0, 0, 0, 3:], -np.array(
        [0.411, 0.432, 0.450]), atol=1e-5)


def test_embed_aggregator_identical_refs_average():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 4, 4, 8), jnp.float32)
    ref = jnp.tile(x, (3, 1, 1, 1))
    agg = EmbedAggregator()
    v = agg.init(jax.random.PRNGKey(0), x, ref)
    out = agg.apply(v, x, ref)
    # identical refs -> softmax uniform -> output == ref value
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_embed_aggregator_mask_excludes_refs():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 4, 4, 8), jnp.float32)
    ref = jnp.asarray(rng.rand(3, 4, 4, 8), jnp.float32)
    agg = EmbedAggregator()
    v = agg.init(jax.random.PRNGKey(1), x, ref)
    masked = agg.apply(v, x, ref, jnp.asarray([True, True, False]))
    dropped = agg.apply(v, x, ref[:2], jnp.asarray([True, True]))
    np.testing.assert_allclose(np.asarray(masked), np.asarray(dropped),
                               atol=1e-5)


def test_flownet_output_shape_small():
    fn = FlowNetSimple()
    pair = jnp.zeros((1, 64, 80, 6))
    v = fn.init(jax.random.PRNGKey(0), pair)
    flow = fn.apply(v, pair)
    # decoder emits at 1/4 of the input and upsamples by 4/img_scale = 8
    assert flow.shape[0] == 1 and flow.shape[3] == 2
    assert flow.shape[1] == 128 and flow.shape[2] == 160


@pytest.mark.skipif(os.environ.get('STTPU_SLOW_TESTS') != '1',
                    reason='full VID streaming models are compile-heavy')
def test_vid_models_stream():
    from stereotracking_tpu.models.two_stage import FasterRCNN, TwoStageConfig
    from stereotracking_tpu.models.vid import DFF, FGFA, SELSA

    cfg = TwoStageConfig(num_classes=3, num_proposals=32, rpn_nms_pre=128,
                         rcnn_max_per_img=10)
    det = FasterRCNN(cfg)
    img = jnp.zeros((1, 128, 160, 3))
    dv = det.init(jax.random.PRNGKey(1), img)
    fn = FlowNetSimple()
    fv = fn.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 6)))
    frame = jnp.asarray(np.random.RandomState(2).rand(1, 128, 160, 3) * 255,
                        jnp.float32)

    d = DFF({'detector': dv, 'flownet': fv}, cfg, key_frame_interval=3)
    st, res = d.detect(frame, 0)
    st, res = d.detect(frame, 1, st)
    assert res.boxes.shape == (10, 4)

    agg = EmbedAggregator()
    af = agg.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 10, 2048)),
                  jnp.zeros((3, 8, 10, 2048)))
    f = FGFA({'detector': dv, 'flownet': fv, 'aggregator': af}, cfg,
             window=3)
    st, res = f.detect(frame, 0)
    st, res = f.detect(frame, 1, st)
    assert res.boxes.shape == (10, 4)

    sel = FasterRCNN(cfg, selsa=True)
    sv = sel.init(jax.random.PRNGKey(3), img)
    s = SELSA(sv, cfg, num_refs=2)
    res = s.detect(frame, jnp.tile(frame, (2, 1, 1, 1)))
    assert res.boxes.shape == (10, 4)


@pytest.mark.skipif(os.environ.get('STTPU_SLOW_TESTS') != '1',
                    reason='full VID inference API is compile-heavy')
def test_inference_vid_api_all_methods():
    from stereotracking_tpu.apis.inference import (inference_vid,
                                                   init_vid_model)
    from stereotracking_tpu.models.two_stage import TwoStageConfig
    cfg = TwoStageConfig(num_classes=3, anchor_scales=(4, 8),
                         rpn_nms_pre=64, num_proposals=16,
                         rcnn_max_per_img=8)
    rng = np.random.RandomState(0)
    for method, kw in [('dff', dict(key_frame_interval=2)),
                       ('selsa', dict(num_refs=2))]:
        m = init_vid_model(method, cfg=cfg, img_hw=(64, 96), **kw)
        state = None
        for f in range(2):
            img = rng.rand(64, 96, 3).astype(np.float32) * 255
            state, out = inference_vid(m, img, f, state)
            assert np.isfinite(out['bboxes']).all()


def test_flow_warp_matches_torch_grid_sample():
    """A/B the bilinear warp against torch F.grid_sample with
    align_corners=True + border padding (the reference flow_warp_feats
    sampling mode) on same-resolution flow."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    n, h, w, c = 2, 9, 13, 5
    feat = rng.rand(n, h, w, c).astype(np.float32)
    flow = (rng.randn(n, h, w, 2) * 2.5).astype(np.float32)

    got = np.asarray(flow_warp_feats(jnp.asarray(feat),
                                     jnp.asarray(flow)))

    tf = torch.from_numpy(feat).permute(0, 3, 1, 2)
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing='ij')
    sx = gx[None] + flow[..., 0]
    sy = gy[None] + flow[..., 1]
    # normalize to [-1, 1] (align_corners=True convention)
    nx = 2 * sx / (w - 1) - 1
    ny = 2 * sy / (h - 1) - 1
    grid = torch.from_numpy(np.stack([nx, ny], -1))
    ref = F.grid_sample(tf, grid, mode='bilinear', padding_mode='border',
                        align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
