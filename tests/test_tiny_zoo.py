"""Default-gate compiled coverage of every zoo model family.

The full-size model tests are env-gated behind ``STTPU_SLOW_TESTS`` (the
canonical ResNet-50 towers are compile-heavy on the CPU test backend).
These variants shrink only the backbone (``stage_blocks=(1, 1, 1, 1)``,
``base_width=8`` — the deepen/widen ~0.1 recipe of the reference's own
tiny configs) and, for Stark, the transformer depth, keeping every other
code path — crops, heads, streaming state machines, train losses —
identical to the full models, so a regression in any family's compiled
path shows up in the default ``pytest tests/`` run.

Reference scope: mmtrack/models/{sot,vid,vis,mot}/* predict/loss paths.
"""
import jax
import jax.numpy as jnp
import numpy as np

from stereotracking_tpu.models.two_stage import TwoStageConfig

TINY = dict(stage_blocks=(1, 1, 1, 1), base_width=8)


# ---------------------------------------------------------------------------
# SOT
# ---------------------------------------------------------------------------

def test_tiny_stark_module_and_tracker():
    from stereotracking_tpu.models.sot.stark import (StarkModule,
                                                     StarkTestCfg,
                                                     StarkTracker)
    cfg = StarkTestCfg(template_size=64, search_size=96)
    m = StarkModule(cfg, head_layers=1, **TINY)
    z = jnp.zeros((1, 64, 64, 3))
    x = jnp.zeros((1, 96, 96, 3))
    zm = jnp.zeros((1, 64, 64))
    xm = jnp.zeros((1, 96, 96))
    v = m.init(jax.random.PRNGKey(0), [z, z], [zm, zm], x, xm)
    logits, bboxes = m.apply(v, [z, z], [zm, zm], x, xm)
    assert logits.shape == (1, 1, 1) and bboxes.shape == (1, 4)

    trk = StarkTracker(v, cfg, module=m)
    frame = jnp.asarray(np.random.RandomState(1).rand(120, 160, 3),
                        jnp.float32)
    st = trk.init(frame, [50., 40., 90., 80.])
    st, (bb, sc) = trk.track(frame, st)
    bb = np.asarray(bb)
    assert np.isfinite(bb).all() and 0.0 <= float(sc) <= 1.0
    assert bb[2] > bb[0] and bb[3] > bb[1]


def test_tiny_prdimp_tracker():
    from stereotracking_tpu.models.sot.prdimp import (PrDiMPModule,
                                                      PrDiMPTestCfg,
                                                      PrDiMPTracker)
    cfg = PrDiMPTestCfg(img_sample_size=128, sample_memory_size=10,
                        blur_sigmas=((2, 2),), dropout_probs=(0.2,),
                        init_update_iters=2, box_refine_iter=2,
                        num_init_random_boxes=3)
    m = PrDiMPModule(cfg, **TINY)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
               jnp.asarray([[40., 40., 90., 90.]]))
    trk = PrDiMPTracker(v, cfg, module=m)
    frame = jnp.asarray(np.random.RandomState(3).rand(160, 200, 3) * 255,
                        jnp.float32)
    st = trk.init(frame, [60., 50., 120., 110.])
    st, (bb, score) = trk.track(frame, st, np.random.RandomState(4))
    assert np.isfinite(np.asarray(bb)).all()
    assert np.isfinite(float(score))


# ---------------------------------------------------------------------------
# VID (DFF / FGFA / SELSA streaming)
# ---------------------------------------------------------------------------

def test_tiny_vid_models_stream():
    from stereotracking_tpu.models.two_stage import FasterRCNN
    from stereotracking_tpu.models.vid import (DFF, FGFA, SELSA,
                                               EmbedAggregator,
                                               FlowNetSimple)

    cfg = TwoStageConfig(num_classes=3, num_proposals=16, rpn_nms_pre=64,
                         rcnn_max_per_img=8, **TINY)
    det = FasterRCNN(cfg)
    img = jnp.zeros((1, 64, 80, 3))
    dv = det.init(jax.random.PRNGKey(1), img)
    fn = FlowNetSimple()
    fv = fn.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40, 6)))
    frame = jnp.asarray(np.random.RandomState(2).rand(1, 64, 80, 3) * 255,
                        jnp.float32)

    d = DFF({'detector': dv, 'flownet': fv}, cfg, key_frame_interval=3)
    st, res = d.detect(frame, 0)
    st, res = d.detect(frame, 1, st)
    assert res.boxes.shape == (8, 4)

    agg = EmbedAggregator()
    # DC5 output channels with the tiny backbone: 64 * expansion = 256
    af = agg.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 5, 256)),
                  jnp.zeros((3, 4, 5, 256)))
    f = FGFA({'detector': dv, 'flownet': fv, 'aggregator': af}, cfg,
             window=3)
    st, res = f.detect(frame, 0)
    st, res = f.detect(frame, 1, st)
    assert res.boxes.shape == (8, 4)

    sel = FasterRCNN(cfg, selsa=True)
    sv = sel.init(jax.random.PRNGKey(3), img)
    s = SELSA(sv, cfg, num_refs=2)
    res = s.detect(frame, jnp.tile(frame, (2, 1, 1, 1)))
    assert res.boxes.shape == (8, 4)


# ---------------------------------------------------------------------------
# VIS (MaskTrack R-CNN / Mask2Former)
# ---------------------------------------------------------------------------

def test_tiny_masktrack_streaming_and_train_step():
    import optax

    from stereotracking_tpu.models.vis.masktrack_rcnn import (
        MaskTrackRCNNModule, MaskTrackRCNNStreaming, masktrack_train_loss_fn)
    cfg = TwoStageConfig(num_classes=5, anchor_scales=(8,), stride=4,
                         rpn_nms_pre=64, num_proposals=16,
                         rcnn_max_per_img=8, **TINY)
    m = MaskTrackRCNNModule(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    s = MaskTrackRCNNStreaming(v, cfg, num_slots=16, module=m)
    rng = np.random.RandomState(0)
    for f in range(2):
        out = s.track(jnp.asarray(rng.rand(1, 64, 64, 3) * 255,
                                  jnp.float32), f)
        assert np.isfinite(np.asarray(out['bboxes'])).all()
        assert out['masks'].shape[1:] == (28, 28, 5)

    # one jitted train step: loss finite, params move
    params = v['params']
    rest = {k: x for k, x in v.items() if k != 'params'}
    loss_fn = masktrack_train_loss_fn(m, num_rois=16)
    tx = optax.sgd(1e-4, momentum=0.9)
    opt = tx.init(params)

    @jax.jit
    def step(params, rest, opt, batch, key):
        (total, (losses, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, rest, batch, key)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), total

    masks = np.zeros((2, 64, 64), np.float32)
    masks[0, 12:38, 12:38] = 1
    masks[1, 22:48, 40:60] = 1
    batch = dict(
        img=jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        ref_img=jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        gt_bboxes=jnp.asarray([[10, 10, 40, 40], [40, 20, 60, 50]],
                              jnp.float32),
        gt_labels=jnp.asarray([0, 1], jnp.int32),
        gt_ids=jnp.asarray([5, 9], jnp.int32),
        gt_valid=jnp.asarray([True, True]),
        gt_masks=jnp.asarray(masks),
        ref_gt_bboxes=jnp.asarray([[12, 12, 42, 42], [42, 22, 62, 52]],
                                  jnp.float32),
        ref_gt_ids=jnp.asarray([5, 9], jnp.int32),
        ref_gt_valid=jnp.asarray([True, True]))
    p2, total = step(params, rest, opt, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(total))


def test_tiny_mask2former_module_forward():
    from stereotracking_tpu.models.vis import (Mask2FormerConfig,
                                               Mask2FormerVIS)
    cfg = Mask2FormerConfig(num_classes=5, num_queries=8, embed_dim=64,
                            num_heads=4, num_decoder_layers=2, ffn_dim=128,
                            pixel_decoder_layers=1, num_points=64,
                            max_per_video=4, **TINY)
    m = Mask2FormerVIS(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 3),
                       jnp.float32)
    v = m.init(jax.random.PRNGKey(0), imgs)
    cls_list, mask_list = m.apply(v, imgs)
    assert len(cls_list) == cfg.num_decoder_layers + 1
    assert cls_list[-1].shape == (cfg.num_queries, cfg.num_classes + 1)
    assert mask_list[-1].shape == (cfg.num_queries, 2, 16, 24)
    assert np.isfinite(np.asarray(mask_list[-1])).all()


# ---------------------------------------------------------------------------
# MOT extras (QDTrack / Tracktor / StrongSORT)
# ---------------------------------------------------------------------------

def test_tiny_qdtrack_streaming_and_train_step():
    import optax

    from stereotracking_tpu.models.qdtrack import (QDTrackModule,
                                                   QDTrackStreaming,
                                                   qdtrack_train_loss_fn)
    m = QDTrackModule(num_classes=2, **TINY)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    s = QDTrackStreaming(v, num_classes=2, module=m)
    rng = np.random.RandomState(0)
    for f in range(2):
        out = s.track(jnp.asarray(rng.rand(1, 64, 96, 3) * 255,
                                  jnp.float32), f)
        assert np.isfinite(np.asarray(out['bboxes'])).all()

    params = v['params']
    rest = {k: x for k, x in v.items() if k != 'params'}
    loss_fn = qdtrack_train_loss_fn(m, num_rois=16)
    tx = optax.sgd(1e-4, momentum=0.9)
    opt = tx.init(params)

    @jax.jit
    def step(params, rest, opt, batch, key):
        (total, _), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params, rest, batch, key)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), total

    batch = dict(
        img=jnp.asarray(rng.rand(1, 64, 96, 3) * 255, jnp.float32),
        ref_img=jnp.asarray(rng.rand(1, 64, 96, 3) * 255, jnp.float32),
        gt_bboxes=jnp.asarray([[10, 10, 40, 40], [50, 20, 80, 50]],
                              jnp.float32),
        gt_labels=jnp.asarray([0, 1], jnp.int32),
        gt_ids=jnp.asarray([5, 9], jnp.int32),
        gt_valid=jnp.asarray([True, True]),
        ref_gt_bboxes=jnp.asarray([[12, 12, 42, 42], [52, 22, 82, 52]],
                                  jnp.float32),
        ref_gt_ids=jnp.asarray([5, 9], jnp.int32),
        ref_gt_valid=jnp.asarray([True, True]))
    _, total = step(params, rest, opt, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(total))


def test_tiny_tracktor_streaming():
    from stereotracking_tpu.models.reid import BaseReID
    from stereotracking_tpu.models.tracktor import (TracktorConfig,
                                                    TracktorStreaming)
    from stereotracking_tpu.models.two_stage import FasterRCNN
    det_cfg = TwoStageConfig(num_classes=1, anchor_scales=(4, 8),
                             rpn_nms_pre=64, num_proposals=16,
                             rcnn_max_per_img=8, **TINY)
    fr = FasterRCNN(det_cfg)
    fv = fr.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 96, 3)))
    reid = BaseReID(embed_dim=32, num_classes=1)
    rv = reid.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 16, 3)))
    cfg = TracktorConfig(num_slots=8, embed_dim=32, num_samples=3)
    tr = TracktorStreaming(fv, rv, det_cfg, cfg, input_shape=(64, 96),
                           reid_hw=(32, 16), num_dets=8)
    rng = np.random.RandomState(0)
    for f in range(2):
        out = tr.track(jnp.asarray(rng.rand(1, 64, 96, 3) * 255,
                                   jnp.float32), f)
        assert np.isfinite(np.asarray(out['bboxes'])).all()


def test_tiny_strongsort_streaming():
    from stereotracking_tpu.models.detector import (DetectorConfig,
                                                    YOLOXDetector)
    from stereotracking_tpu.models.reid import BaseReID
    from stereotracking_tpu.models.strongsort import (StrongSORTConfig,
                                                      StrongSORTStreaming)
    det_cfg = DetectorConfig(num_classes=1, max_per_img=16,
                             pre_nms_top_k=64, widen_factor=0.25)
    det = YOLOXDetector(det_cfg)
    inp0 = {'img': jnp.zeros((1, 64, 96, 3)),
            'disp_postp': jnp.zeros((1, 64, 96, 3)),
            'disp_mask': jnp.zeros((1, 64, 96, 1))}
    dv = det.init(jax.random.PRNGKey(0), inp0)
    reid = BaseReID(embed_dim=32, num_classes=1)
    rv = reid.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 16, 3)))
    cfg = StrongSORTConfig(num_slots=16, embed_dim=32)
    ss = StrongSORTStreaming(dv, rv, det_cfg, cfg, reid_hw=(32, 16),
                             input_shape=(64, 96))
    rng = np.random.RandomState(0)
    for f in range(2):
        inp = {'img': jnp.asarray(rng.rand(1, 64, 96, 3) * 255,
                                  jnp.float32),
               'disp_postp': jnp.asarray(rng.rand(1, 64, 96, 3),
                                         jnp.float32),
               'disp_mask': jnp.ones((1, 64, 96, 1))}
        out = ss.track(inp, f)
        assert np.isfinite(np.asarray(out['bboxes'])).all()
