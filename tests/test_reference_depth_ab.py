"""A/B the REFERENCE depth chain + predict orchestration against our build.

VERDICT r4 missing #1/#2: the tracker earned the imported-reference A/B
treatment (tests/test_reference_tracker_ab.py) but the depth chain and the
predict-path ordering were only A/B'd against the builder's own numpy
replica, so a shared misreading would pass.  This module closes both gaps:

* imports the actual ``OCSORT_Disparity`` from /root/reference (never
  copied) with the mm* dependencies stubbed at the import boundary, plus
  the REAL reference tracker + Kalman filter + ``scale_bbox`` +
  ``save_prediction_results``;
* A/Bs ``disp2depth`` / ``extract_depth`` / ``bbox_postp_depth``
  (ocsort_disparity.py:113-175) function-by-function on random worlds
  against ``ops/depth.py`` (both the float path and the production
  integer-domain path);
* drives the reference's full ``predict`` (scale -> track -> unscale ->
  re-extract, ocsort_disparity.py:50-111) over whole synthetic videos with
  identical injected detections on both sides, comparing per-frame track
  ids/boxes/scales/depths against our ``predict_frame``
  (stereotracking_tpu/models/mot.py);
* metric-level: both outputs feed the same MOTDroneMetrics and the final
  MOTA/HOTA/IDF1 must be identical.

Skipped automatically when /root/reference is not present.
"""
import contextlib
import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = '/root/reference/mmtrack'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason='reference checkout not available')

BASELINE, FOCAL = 0.25, 640.0
H, W = 96, 128
ND = 24          # detection slots on our side


# ---------------------------------------------------------------------------
# dependency stubs (import-boundary only)
# ---------------------------------------------------------------------------

class _Inst:
    """mmengine.structures.InstanceData stand-in rich enough for the
    predict path: attribute + item access, .get, .clone."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __getitem__(self, k):
        return self.__dict__[k]

    def __setitem__(self, k, v):
        self.__dict__[k] = v

    def get(self, k, default=None):
        return self.__dict__.get(k, default)

    def clone(self):
        import torch
        out = {}
        for k, v in self.__dict__.items():
            out[k] = v.clone() if torch.is_tensor(v) else v
        return _Inst(**out)


class _ADict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            v = _ADict()
            self[k] = v
            return v

    def __setattr__(self, k, v):
        self[k] = v


def _bbox_overlaps(b1, b2, mode='iou', is_aligned=False, eps=1e-6):
    import torch
    if b1.numel() == 0 or b2.numel() == 0:
        return torch.zeros((b1.size(0), b2.size(0)))
    lt = torch.max(b1[:, None, :2], b2[None, :, :2])
    rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return inter / union.clamp(min=eps)


def _bbox_xyxy_to_cxcywh(bbox):
    import torch
    cx = (bbox[..., 0] + bbox[..., 2]) / 2
    cy = (bbox[..., 1] + bbox[..., 3]) / 2
    w = bbox[..., 2] - bbox[..., 0]
    h = bbox[..., 3] - bbox[..., 1]
    return torch.stack([cx, cy, w, h], dim=-1)


def _lapjv(cost, extend_cost=True, cost_limit=np.inf):
    from stereotracking_tpu._native import lapjv_cost_limit
    row, col = lapjv_cost_limit(np.asarray(cost, np.float64), cost_limit)
    return 0.0, row.astype(np.int32), col.astype(np.int32)


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _file_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _pkg(name, path):
    m = types.ModuleType(name)
    m.__path__ = [path]
    sys.modules[name] = m
    return m


@contextlib.contextmanager
def _chdir(path):
    prev = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(prev)


@pytest.fixture(scope='module')
def refmot(tmp_path_factory):
    """Load the reference OCSORT_Disparity + tracker + KF with stubs."""
    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    class _BaseModel:
        def __init__(self, data_preprocessor=None, init_cfg=None):
            pass

    if not hasattr(np, 'int'):      # reference uses the removed np.int alias
        np.int = int

    _mod('addict', Dict=_ADict)
    _mod('lap', lapjv=_lapjv)
    mmengine = _mod('mmengine')
    mmengine.structures = _mod('mmengine.structures', InstanceData=_Inst)
    mmengine.model = _mod('mmengine.model', BaseModel=_BaseModel)
    mmdet = _mod('mmdet')
    mmdet.structures = _mod('mmdet.structures')
    mmdet.structures.bbox = _mod('mmdet.structures.bbox',
                                 bbox_overlaps=_bbox_overlaps)
    mmdet.structures.bbox.transforms = _mod(
        'mmdet.structures.bbox.transforms',
        bbox_xyxy_to_cxcywh=_bbox_xyxy_to_cxcywh)
    mmtrack = _mod('mmtrack')
    mmtrack.registry = _mod('mmtrack.registry', MODELS=_Registry(),
                            TASK_UTILS=_Registry())
    mmtrack.utils = _mod('mmtrack.utils', OptConfigType=object,
                         OptMultiConfig=object, SampleList=object,
                         OptSampleList=object, ForwardResults=object,
                         imrenormalize=lambda *a, **k: None)
    # the REAL reference CSV-dump decorator (applied to predict at class
    # definition; it deletes ./results.csv at import -> import inside tmp)
    cr = _file_module('mmtrack.utils.collect_results',
                      f'{REF}/utils/collect_results.py')
    mmtrack.utils.collect_results = cr
    mmtrack.structures = _mod('mmtrack.structures', TrackDataSample=object)
    mmtrack.structures.bbox = _file_module(
        'mmtrack.structures.bbox', f'{REF}/structures/bbox/transforms.py')

    # package skeleton so ``from ..trackers.utils import scale_bbox``
    # resolves to the REAL reference files without executing the package
    # __init__s (which import the full mm model zoo)
    _pkg('refm', f'{REF}/models')
    _pkg('refm.mot', f'{REF}/models/mot')
    _pkg('refm.trackers', f'{REF}/models/trackers')

    tmp = tmp_path_factory.mktemp('refmot_import')
    with _chdir(tmp):
        mot = importlib.import_module('refm.mot.ocsort_disparity')
        trk = importlib.import_module('refm.trackers.ocsort_tracker_disparity')
    kf = _file_module('refdepthkf', f'{REF}/models/motion/kalman_filter.py')
    return mot, trk, kf


# ---------------------------------------------------------------------------
# synthetic stereo worlds
# ---------------------------------------------------------------------------

class World:
    """Objects at fixed metric depth moving over an invalid-disparity
    background, plus per-frame injected detections and GT tracks."""

    def __init__(self, seed, n_frames=35):
        rng = np.random.RandomState(seed)
        self.n_frames = n_frames
        n_obj = 4 + seed % 3
        self.depths = 1.0 + rng.rand(n_obj) * 0.7      # scale in (1, 3)
        pos = np.stack([rng.uniform(18, W - 48, n_obj),
                        rng.uniform(14, H - 44, n_obj)], axis=1)
        vel = rng.uniform(-0.8, 0.8, (n_obj, 2))
        wh = np.stack([rng.uniform(12, 28, n_obj),
                       rng.uniform(10, 24, n_obj)], axis=1)
        # static distractor patches: valid disparity, no GT — targets for
        # spurious detections (deeper depths exercise the scale=3 clip)
        dis_pos = np.stack([rng.uniform(10, W - 34, 2),
                            rng.uniform(8, H - 28, 2)], axis=1)
        dis_wh = rng.uniform(14, 22, (2, 2))
        dis_depth = rng.uniform(1.2, 5.0, 2)

        self.frames = []
        for f in range(n_frames):
            p = pos + vel * f
            p[:, 0] = np.clip(p[:, 0], 10, W - wh[:, 0] - 10)
            p[:, 1] = np.clip(p[:, 1], 8, H - wh[:, 1] - 8)
            gt_boxes = np.concatenate([p, p + wh], axis=1)

            raw = np.zeros((H, W), np.uint16)
            # sprinkle of valid background at random depths (exercises the
            # corner-vote branches with mixed votes)
            nb = rng.randint(60, 140)
            by = rng.randint(0, H, nb)
            bx = rng.randint(0, W, nb)
            raw[by, bx] = rng.randint(20, 2800, nb)
            gt_map = np.zeros((H, W), np.float32)
            for k in range(2):
                x1, y1 = dis_pos[k].astype(int)
                x2 = int(x1 + dis_wh[k, 0])
                y2 = int(y1 + dis_wh[k, 1])
                base = int(round(16.0 * BASELINE * FOCAL / dis_depth[k]))
                raw[y1:y2, x1:x2] = np.clip(
                    base + rng.randint(-8, 9, (y2 - y1, x2 - x1)), 16, 65000)
            for k in range(n_obj):
                x1, y1, x2, y2 = gt_boxes[k].astype(int)
                d = self.depths[k]
                base = int(round(16.0 * BASELINE * FOCAL / d))
                noise = rng.randint(-8, 9, (y2 - y1, x2 - x1))
                raw[y1:y2, x1:x2] = np.clip(base + noise, 16, 65000)
                gt_map[y1:y2, x1:x2] = d

            # injected detections: jittered GT + dropouts + spurious
            det_boxes, det_scores = [], []
            gt_ids_here, gt_here = [], []
            for k in range(n_obj):
                gt_ids_here.append(k)
                gt_here.append(gt_boxes[k])
                if rng.rand() < 0.15 and f > 0:
                    continue
                jit = rng.uniform(-1.5, 1.5, 4)
                det_boxes.append(gt_boxes[k] + jit)
                det_scores.append(rng.uniform(0.55, 0.95))
            for _ in range(rng.poisson(0.4)):
                k = rng.randint(2)
                x1 = dis_pos[k, 0] + rng.uniform(-2, 2)
                y1 = dis_pos[k, 1] + rng.uniform(-2, 2)
                det_boxes.append([x1, y1, x1 + dis_wh[k, 0],
                                  y1 + dis_wh[k, 1]])
                det_scores.append(rng.uniform(0.35, 0.75))
            det_boxes = np.asarray(det_boxes, np.float32).reshape(-1, 4)
            det_boxes[:, [0, 2]] = np.clip(det_boxes[:, [0, 2]], 1, W - 1)
            det_boxes[:, [1, 3]] = np.clip(det_boxes[:, [1, 3]], 1, H - 1)
            det_scores = np.asarray(det_scores, np.float32)
            order = np.argsort(-det_scores)
            self.frames.append(dict(
                raw=raw, gt_map=gt_map,
                det_boxes=det_boxes[order], det_scores=det_scores[order],
                gt_ids=np.asarray(gt_ids_here),
                gt_boxes=np.asarray(gt_here, np.float32).reshape(-1, 4)))

    def disp_postp(self, f):
        raw = self.frames[f]['raw'].astype(np.float32)
        return np.where(self.frames[f]['raw'] == 65535, 0.0, raw) / 16.0


# ---------------------------------------------------------------------------
# function-level A/B: disp2depth / extract_depth / bbox_postp_depth
# ---------------------------------------------------------------------------

def _ref_model(refmot, **trk_kwargs):
    mot, trk, kf = refmot
    model = mot.OCSORT_Disparity(baseline=BASELINE, focal_length=FOCAL)
    model.tracker = trk.OCSORTTracker_Disparity(
        obj_score_thr=0.3, init_track_thr=0.7,
        weight_iou_with_det_scores=True, match_iou_thr=0.1,
        num_tentatives=3, vel_consist_weight=0.2, vel_delta_t=3,
        num_frames_retain=30, **trk_kwargs)
    model.motion = kf.KalmanFilter()
    return model


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_extract_depth_ab(refmot, seed):
    """ocsort_disparity.py:132-175 vs ops/depth.py on random worlds, both
    the float path and the production integer-domain path."""
    import jax.numpy as jnp
    import torch

    from stereotracking_tpu.ops.depth import (disp_to_depth,
                                              extract_box_depths,
                                              extract_box_depths_disp)

    world = World(seed, n_frames=4)
    model = _ref_model(refmot)
    for f in range(world.n_frames):
        fr = world.frames[f]
        disp = world.disp_postp(f)
        boxes = fr['det_boxes']
        n = len(boxes)
        if n == 0:
            continue

        # reference: metric depth map materialized, host loop
        depth_t = torch.from_numpy(
            BASELINE * FOCAL / (disp + 1e-6))[None, None]
        ref_d, ref_s = model.extract_depth(depth_t, torch.from_numpy(boxes))
        ref_d = np.asarray(ref_d, np.float64)
        ref_s = np.asarray(ref_s, np.float64)

        valid = jnp.ones((n,), bool)
        jb = jnp.asarray(boxes)
        # float path
        d1, s1 = extract_box_depths(
            jnp.asarray(disp_to_depth(jnp.asarray(disp), BASELINE, FOCAL)),
            jb, valid, crop=64, mode='corner_guided')
        # integer-domain production path
        d2, s2 = extract_box_depths_disp(jnp.asarray(disp), jb, valid,
                                         BASELINE, FOCAL, crop=64)
        # boxes with exactly ONE valid pixel: the reference's empty-segment
        # fallback ``d_sorted[:-1]`` is empty and np.mean yields NaN
        # (ocsort_disparity.py:165-167); ours returns that pixel — the
        # documented deviation (ops/depth.py module docstring). Exclude.
        nan_ref = ~np.isfinite(ref_d)
        for tag, d, s in (('float', d1, s1), ('int', d2, s2)):
            d = np.asarray(d, np.float64)
            s = np.asarray(s, np.float64)
            inval = (ref_d < 0) & ~nan_ref
            assert (d[inval] == -1).all(), (tag, f)
            assert (s[inval] == 1).all(), (tag, f)
            ok = ~inval & ~nan_ref
            np.testing.assert_allclose(d[ok], ref_d[ok], rtol=1e-4,
                                       err_msg=f'{tag} frame {f}')
            np.testing.assert_allclose(s[ok], ref_s[ok], rtol=1e-4,
                                       err_msg=f'{tag} frame {f}')


def test_bbox_postp_depth_ab(refmot):
    """Full bbox_postp_depth: depth + depth^2 scale clip + scale_bbox
    inflation (ocsort_disparity.py:113-130 + trackers/utils.py:58-73)."""
    import jax.numpy as jnp
    import torch

    from stereotracking_tpu.ops.depth import extract_box_depths_disp
    from stereotracking_tpu.structures.bbox import scale_bbox

    world = World(3, n_frames=3)
    model = _ref_model(refmot)
    for f in range(world.n_frames):
        fr = world.frames[f]
        disp = world.disp_postp(f)
        boxes = fr['det_boxes']
        if len(boxes) == 0:
            continue
        inst = _Inst(bboxes=torch.from_numpy(boxes.copy()),
                     scores=torch.from_numpy(fr['det_scores']))
        disp_t = torch.from_numpy(disp)[None].repeat(3, 1, 1)[None]
        out, dvals = model.bbox_postp_depth(inst, disp_t, None)

        d, s = extract_box_depths_disp(
            jnp.asarray(disp), jnp.asarray(boxes),
            jnp.ones((len(boxes),), bool), BASELINE, FOCAL, crop=64)
        scaled = scale_bbox(jnp.asarray(boxes), s)
        np.testing.assert_allclose(np.asarray(s), out.scales.numpy(),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(scaled), out.bboxes.numpy(),
                                   rtol=1e-4, atol=1e-3)
        ref_d = np.asarray(dvals['d_values'], np.float64)
        ours_d = np.asarray(d, np.float64)
        inval = ref_d < 0
        assert (ours_d[inval] == -1).all()
        np.testing.assert_allclose(ours_d[~inval], ref_d[~inval], rtol=1e-4)


# ---------------------------------------------------------------------------
# predict-path A/B: whole videos, identical injected detections
# ---------------------------------------------------------------------------

def _run_reference_video(refmot, world, tmpdir):
    """Drive the reference predict (detector stubbed to the injected
    detections; REAL depth chain + tracker + KF + unscale + CSV dump)."""
    import torch

    model = _ref_model(refmot)
    cell = {'f': 0}

    class _Det:
        def predict(self, data, samples):
            fr = world.frames[cell['f']]
            n = len(fr['det_boxes'])
            inst = _Inst(bboxes=torch.from_numpy(fr['det_boxes'].copy()),
                         scores=torch.from_numpy(fr['det_scores'].copy()),
                         labels=torch.zeros(n, dtype=torch.long))
            return [types.SimpleNamespace(pred_instances=inst)]

    model.detector = _Det()
    outs = []
    for f in range(world.n_frames):
        cell['f'] = f
        disp = world.disp_postp(f)
        inputs = {
            'img': torch.zeros(1, 1, 3, H, W),
            'disp_postp': torch.from_numpy(disp)[None].repeat(
                3, 1, 1)[None, None],
            'disp_mask': torch.from_numpy(
                (world.frames[f]['raw'] != 65535).astype(
                    np.float32))[None, None, None],
            'depth_postp': torch.from_numpy(
                world.frames[f]['gt_map'])[None, None, None],
        }
        sample = types.SimpleNamespace(metainfo={'frame_id': f}, frame_id=f)
        with _chdir(tmpdir):
            res = model.predict(inputs, [sample])
        ti = res[0].pred_track_instances
        outs.append({
            'ids': ti.instances_id.numpy().copy(),
            'boxes': ti.bboxes.numpy().copy(),
            'scores': ti.scores.numpy().copy(),
            'scales': ti.scales.numpy().copy(),
            'depth': np.asarray(ti['depth'], np.float64),
            'gt_depth': np.asarray(ti['gt_depth'], np.float64),
        })
    return outs


def _run_ours_video(world, monkeypatch):
    """Our predict_frame with detector_predict monkeypatched to return the
    identical injected detections (everything downstream is the production
    code: integer-domain depth, scale, tracker step, unscale, re-extract)."""
    import jax.numpy as jnp

    from stereotracking_tpu.models import mot as mot_mod
    from stereotracking_tpu.models import tracker as trk
    from stereotracking_tpu.models.detector import DetectorConfig
    from stereotracking_tpu.models.mot import MOTConfig
    from stereotracking_tpu.models.tracker import TrackerConfig
    from stereotracking_tpu.ops.nms import NMSResult

    def fake_detector_predict(variables, module, inputs, scale_factor=(1, 1),
                              **kw):
        return NMSResult(inputs['inject_boxes'], inputs['inject_scores'],
                         inputs['inject_labels'], inputs['inject_valid'])

    monkeypatch.setattr(mot_mod, 'detector_predict', fake_detector_predict)
    cfg = MOTConfig(
        detector=DetectorConfig(),
        tracker=TrackerConfig(num_slots=48, num_dets=ND,
                              obj_score_thr=0.3, init_track_thr=0.7,
                              weight_iou_with_det_scores=True,
                              match_iou_thr=0.1, num_tentatives=3,
                              vel_consist_weight=0.2, vel_delta_t=3,
                              num_frames_retain=30),
        baseline=BASELINE, focal_length=FOCAL, depth_crop=64,
        reuse_det_depth=False)     # reference re-extracts (:100-104)

    state = trk.init_state(cfg.tracker)
    # jit the whole per-frame program like production does (model.track):
    # eagerly-dispatched lax.cond compiles a standalone executable whose
    # persistent-cache READ segfaults jaxlib late in a long pytest process
    # (reproducible at this fixture in the full suite; fine in isolation)
    import functools

    import jax
    step = jax.jit(functools.partial(
        mot_mod.predict_frame, {}, None, cfg=cfg))
    outs = []
    for f in range(world.n_frames):
        fr = world.frames[f]
        disp = world.disp_postp(f)
        n = len(fr['det_boxes'])
        boxes = np.zeros((ND, 4), np.float32)
        scores = np.zeros((ND,), np.float32)
        boxes[:n] = fr['det_boxes']
        scores[:n] = fr['det_scores']
        valid = np.arange(ND) < n
        inputs = {
            'img': jnp.zeros((1, H, W, 3), jnp.float32),
            'disp_postp': jnp.asarray(disp)[None, :, :, None].repeat(
                3, axis=3),
            'disp_mask': jnp.asarray(
                (fr['raw'] != 65535).astype(np.float32))[None, :, :, None],
            'depth_postp': jnp.asarray(fr['gt_map'])[None, :, :, None],
            'inject_boxes': jnp.asarray(boxes),
            'inject_scores': jnp.asarray(scores),
            'inject_labels': jnp.zeros((ND,), jnp.int32),
            'inject_valid': jnp.asarray(valid),
        }
        state, res = step(state, inputs, jnp.int32(f))
        keep = np.asarray(res.track_valid)
        outs.append({
            'ids': np.asarray(res.track_ids)[keep],
            'boxes': np.asarray(res.track_bboxes)[keep],
            'scores': np.asarray(res.track_scores)[keep],
            'scales': np.asarray(res.track_scales)[keep],
            'depth': np.asarray(res.track_depths, np.float64)[keep],
            'gt_depth': np.asarray(res.track_gt_depths, np.float64)[keep],
        })
    return outs


@pytest.fixture(scope='module')
def ab_runs(refmot, tmp_path_factory):
    """Both pipelines over the same worlds (shared by the per-frame and the
    metric-level tests)."""
    mp = pytest.MonkeyPatch()
    runs = {}
    try:
        for seed in (0, 1):
            world = World(seed)
            tmp = tmp_path_factory.mktemp(f'refpredict{seed}')
            runs[seed] = (world,
                          _run_reference_video(refmot, world, tmp),
                          _run_ours_video(world, mp))
    finally:
        mp.undo()
    return runs


@pytest.mark.parametrize('seed', [0, 1])
def test_predict_ordering_ab(ab_runs, seed):
    """Per-frame equality of the full predict chain output
    (ocsort_disparity.py:50-111): same track ids, same unscaled boxes,
    same scales, same reported depths."""
    world, ref_outs, our_outs = ab_runs[seed]
    for f, (r, o) in enumerate(zip(ref_outs, our_outs)):
        assert set(r['ids'].tolist()) == set(o['ids'].tolist()), \
            f'frame {f}: ref ids {sorted(r["ids"])} vs ours {sorted(o["ids"])}'
        ri = {int(i): j for j, i in enumerate(r['ids'])}
        oi = {int(i): j for j, i in enumerate(o['ids'])}
        for tid in ri:
            a, b = ri[tid], oi[tid]
            np.testing.assert_allclose(
                o['boxes'][b], r['boxes'][a], atol=5e-3,
                err_msg=f'frame {f} id {tid} box')
            np.testing.assert_allclose(
                o['scales'][b], r['scales'][a], rtol=1e-3,
                err_msg=f'frame {f} id {tid} scale')
            # re-extracted depths run on int-truncated boxes: a 1e-3 box
            # difference can shift the window a pixel, so compare loosely
            # (the maps are near-constant per object) with -1 exact
            rd, od = r['depth'][a], o['depth'][b]
            if rd < 0 or od < 0:
                assert rd < 0 and od < 0, f'frame {f} id {tid} depth'
            else:
                np.testing.assert_allclose(od, rd, rtol=0.05,
                                           err_msg=f'frame {f} id {tid}')
            rg, og = r['gt_depth'][a], o['gt_depth'][b]
            if rg < 0 or og < 0:
                assert rg < 0 and og < 0
            else:
                np.testing.assert_allclose(og, rg, rtol=0.05)


@pytest.mark.parametrize('seed', [0, 1])
def test_whole_video_metrics_ab(ab_runs, seed):
    """Metric-level A/B: reference predict loop vs ours on identical
    synthetic detections produce IDENTICAL MOTA/HOTA/IDF1 under the drone
    protocol (mot_drone_metrics.py:155-321 semantics)."""
    from stereotracking_tpu.evaluation.mot_metrics import MOTDroneMetrics

    world, ref_outs, our_outs = ab_runs[seed]
    results = {}
    for tag, outs in (('ref', ref_outs), ('ours', our_outs)):
        m = MOTDroneMetrics(depth_thr=80.0)
        for f, o in enumerate(outs):
            fr = world.frames[f]
            gt_z = world.depths[fr['gt_ids']]
            m.process_frame(f'v{seed}', f, fr['gt_ids'], fr['gt_boxes'],
                            gt_z, o['ids'], o['boxes'], o['depth'])
        results[tag] = m.evaluate(('HOTA', 'CLEAR', 'Identity'))

    assert results['ref'].keys() == results['ours'].keys()
    for k in ('MOTA', 'IDF1', 'HOTA', 'IDSW', 'CLR_TP', 'CLR_FP', 'CLR_FN'):
        assert np.isclose(results['ref'][k], results['ours'][k],
                          atol=1e-9), \
            f'{k}: ref {results["ref"][k]} vs ours {results["ours"][k]}'
