"""LinearMotion + ECC CameraMotionCompensation tests.

LinearMotion is A/B'd against the actual reference implementation
(imported from /root/reference with a stub registry); ECC is validated by
recovering a known synthetic translation/rotation.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from stereotracking_tpu.models.motion import (CameraMotionCompensation,
                                              LinearMotion, linear_step,
                                              linear_velocity, warp_bboxes)

REF = '/root/reference/mmtrack/models/motion/linear_motion.py'


@pytest.fixture(scope='module')
def ref_linear():
    if not os.path.exists(REF):
        pytest.skip('reference checkout not available')
    torch = pytest.importorskip('torch')

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    if 'mmtrack.registry' not in sys.modules:
        mm = types.ModuleType('mmtrack')
        mm.registry = types.ModuleType('mmtrack.registry')
        mm.registry.TASK_UTILS = _Reg()
        sys.modules.setdefault('mmtrack', mm)
        sys.modules['mmtrack.registry'] = mm.registry
    else:
        if not hasattr(sys.modules['mmtrack.registry'], 'TASK_UTILS'):
            sys.modules['mmtrack.registry'].TASK_UTILS = _Reg()
    spec = importlib.util.spec_from_file_location('ref_linear_motion', REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize('center_motion', [False, True])
@pytest.mark.parametrize('num_samples', [2, 3, 4])
def test_linear_motion_matches_reference(ref_linear, center_motion,
                                         num_samples):
    import torch
    rng = np.random.RandomState(num_samples + 10 * center_motion)
    hist = rng.uniform(0, 100, (6, 4)).astype(np.float32)
    hist[:, 2:] = hist[:, :2] + rng.uniform(5, 30, (6, 2))

    ref = ref_linear.LinearMotion(num_samples=num_samples,
                                  center_motion=center_motion)
    t_hist = [torch.from_numpy(b) for b in hist]
    want_v = ref.get_velocity(t_hist).numpy()
    want_b = ref.step([torch.from_numpy(b.copy()) for b in hist],
                      torch.from_numpy(want_v.copy())).numpy()

    ours = LinearMotion(num_samples=num_samples, center_motion=center_motion)
    got_v = np.asarray(ours.get_velocity(hist))
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-5)
    got_b = np.asarray(ours.step(hist, got_v))
    np.testing.assert_allclose(got_b, want_b, rtol=1e-5, atol=1e-4)


def test_linear_velocity_partial_history():
    """num_valid < num_samples: only the valid trailing diffs are used."""
    hist = np.zeros((5, 4), np.float32)
    hist[3] = [10, 10, 20, 20]
    hist[4] = [13, 14, 23, 24]
    v = np.asarray(linear_velocity(hist, num_valid=np.asarray(2),
                                   num_samples=4))
    np.testing.assert_allclose(v, [3, 4, 3, 4])
    stepped = np.asarray(linear_step(hist[4], v))
    np.testing.assert_allclose(stepped, [16, 18, 26, 28])


def test_warp_bboxes_identity_and_shift():
    boxes = np.array([[10., 20., 30., 40.], [0., 0., 5., 5.]])
    eye = np.array([[1., 0., 0.], [0., 1., 0.]])
    np.testing.assert_allclose(np.asarray(warp_bboxes(boxes, eye)), boxes)
    shift = np.array([[1., 0., 7.], [0., 1., -3.]])
    got = np.asarray(warp_bboxes(boxes, shift))
    np.testing.assert_allclose(got[:, 0], boxes[:, 0] + 7)
    np.testing.assert_allclose(got[:, 3], boxes[:, 3] - 3)


def test_ecc_recovers_translation():
    cv2 = pytest.importorskip('cv2')
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (120, 160), np.uint8)
    base = cv2.GaussianBlur(base, (7, 7), 2.0)
    img = np.repeat(base[:, :, None], 3, -1)
    # ref = img shifted by (+4, +2): warping img->ref should find that shift
    M = np.float32([[1, 0, 4], [0, 1, 2]])
    ref = cv2.warpAffine(img, M, (160, 120))

    cmc = CameraMotionCompensation()
    warp = cmc.get_warp_matrix(img, ref)
    np.testing.assert_allclose(warp[:, 2], [4, 2], atol=0.3)
    np.testing.assert_allclose(warp[:, :2], np.eye(2), atol=0.02)

    boxes = np.array([[30., 40., 60., 70.]])
    warped, _ = cmc.compensate(img, ref, boxes)
    np.testing.assert_allclose(np.asarray(warped)[0],
                               [34, 42, 64, 72], atol=0.5)
