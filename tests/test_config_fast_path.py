"""Config/CLI access to the production serving path (VERDICT r3 #1).

The packed-stem + pallas-depth kernels must be reachable from the
framework's own config surface — ``model.stem_backend`` /
``model.depth_backend`` keys through ``build_mot_config`` — and produce the
same results as the XLA path:

- depth_backend='pallas': FrameResult bit-identical in every integer field,
  depth floats within reassociation ULPs (the ops/depth_pallas.py contract),
  certified here through the full config-driven per-frame program.
- stem_backend='pallas': the raw-frame entry points (track_raw,
  inference_mot) pack the frame host-side and run the MXU stem kernel;
  logit-level fidelity is pinned in tests/test_stem_pallas.py, CLI-level
  metrics equality in tests/test_tools_e2e.py::test_fast_path_metrics_equal.

Reference flagship flow these keys mirror:
/root/reference/configs/stereo_tracking/ocsort/yolox_s_mmyolo_mot_airdrone_disp.py:30-58
driven by /root/reference/tools/test.py:45-88 (entirely config-selected).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stereotracking_tpu.apis.builder import build_mot_config


def test_builder_reads_backend_keys():
    cfg = build_mot_config({'type': 'OCSORT_Disparity',
                            'depth_backend': 'pallas',
                            'stem_backend': 'pallas'})
    assert cfg.depth_backend == 'pallas'
    assert cfg.stem_backend == 'pallas'
    # defaults stay conservative
    cfg = build_mot_config({'type': 'OCSORT_Disparity'})
    assert cfg.depth_backend == 'xla'
    assert cfg.stem_backend == 'xla'


def test_builder_auto_resolves_by_backend():
    cfg = build_mot_config({'type': 'OCSORT_Disparity',
                            'depth_backend': 'auto', 'stem_backend': 'auto'})
    want = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    assert cfg.depth_backend == want
    assert cfg.stem_backend == want


def test_builder_rejects_unknown_backend():
    with pytest.raises(AssertionError):
        build_mot_config({'type': 'OCSORT_Disparity',
                          'depth_backend': 'cuda'})


def test_flagship_config_requests_fast_path():
    """The canonical AirDrone config selects the serving kernels ('auto')
    and pins the exact-reference depth re-extraction for the parity
    protocol (reuse_det_depth=False, ocsort_disparity.py:100-104)."""
    from stereotracking_tpu.config import load_config
    cfg = load_config(
        'configs/stereo_tracking/ocsort/yolox_s_airdrone_disp.py')
    assert cfg['model']['stem_backend'] == 'auto'
    assert cfg['model']['depth_backend'] == 'auto'
    assert cfg['model']['reuse_det_depth'] is False
    mot = build_mot_config(cfg['model'])
    assert mot.reuse_det_depth is False


def _biased_model(depth_backend='xla', stem_backend='xla'):
    """Tiny model whose head biases are shifted so detections clear the
    tracker thresholds (random weights alone track nothing)."""
    from stereotracking_tpu.models.mot import OCSORTDisparity
    cfg = build_mot_config({
        'type': 'OCSORT_Disparity',
        'detector': {'backbone': {'deepen_factor': 0.1,
                                  'widen_factor': 0.125}},
        'depth_backend': depth_backend, 'stem_backend': stem_backend,
        'reuse_det_depth': False,
    })
    m = OCSORTDisparity(cfg, input_shape=(96, 128))
    p = m.variables['params']['bbox_head']
    p = {k: (dict(v, bias=v['bias'] + 4.0)
             if k.startswith(('conv_obj', 'conv_cls')) else v)
         for k, v in p.items()}
    m.variables = dict(m.variables,
                       params=dict(m.variables['params'], bbox_head=p))
    return m


def _frames(n=3, h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    return [(rng.randint(0, 255, (h, w, 3), np.uint8),
             rng.randint(16, 1600, (h, w), np.uint16))
            for _ in range(n)]


def test_depth_pallas_config_path_matches_xla():
    """Full config-driven per-frame program: depth_backend='pallas' must
    reproduce the XLA path exactly — integer/box fields bit-identical,
    depth floats within f32 reassociation ULPs."""
    frames = _frames()
    base = _biased_model('xla')
    fast = _biased_model('pallas')
    fast.variables = base.variables  # same weights
    for fid, (img, disp) in enumerate(frames):
        ra = base.track_raw(img, disp, fid)
        rb = fast.track_raw(img, disp, fid)
        for f in ra._fields:
            xa = np.asarray(getattr(ra, f))
            xb = np.asarray(getattr(rb, f))
            if f in ('track_depths', 'track_gt_depths'):
                np.testing.assert_allclose(xa, xb, rtol=2e-6, atol=1e-5)
            else:
                assert np.array_equal(xa, xb), f
        assert np.asarray(ra.track_valid).sum() > 0  # non-trivial


def test_stem_pallas_config_path_runs_and_packs(monkeypatch):
    """stem_backend='pallas' through the config surface actually routes
    frames through the host packer + packed program (not silently the XLA
    stems), and tracks end-to-end."""
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker
    calls = []
    orig = MultiStreamTracker.pack_frames

    def counting(imgs, disps, oh, ow):
        calls.append(imgs.shape)
        return orig(imgs, disps, oh, ow)

    monkeypatch.setattr(MultiStreamTracker, 'pack_frames',
                        staticmethod(counting))
    m = _biased_model(stem_backend='pallas')
    for fid, (img, disp) in enumerate(_frames(2)):
        res = m.track_raw(img, disp, fid)
    assert len(calls) == 2
    assert np.asarray(res.det_valid).sum() > 0
    assert np.asarray(res.track_valid).sum() > 0


def test_inference_mot_uses_fast_path(monkeypatch):
    """The user-facing inference_mot API honors the config keys."""
    from stereotracking_tpu.apis.inference import inference_mot
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker
    calls = []
    orig = MultiStreamTracker.pack_frames
    monkeypatch.setattr(
        MultiStreamTracker, 'pack_frames',
        staticmethod(lambda *a: calls.append(1) or orig(*a)))
    m = _biased_model(stem_backend='pallas', depth_backend='pallas')
    img, disp = _frames(1)[0]
    out = inference_mot(m, img, disp, 0)
    assert calls, 'stem_backend=pallas did not reach the packer'
    assert out['det_instances']['bboxes'].shape[1] == 4
