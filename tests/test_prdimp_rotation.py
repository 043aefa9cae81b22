"""PrDiMP first-frame rotation augmentation (VERDICT r3 #5).

The reference rotates the expanded init crop with
``mmcv.imrotate(img, angle, border_mode='replicate')``
(/root/reference/mmtrack/models/sot/prdimp.py:197-211) — a thin wrapper
over ``cv2.getRotationMatrix2D((w-1)/2,(h-1)/2, -angle)`` +
``cv2.warpAffine(..., INTER_LINEAR, BORDER_REPLICATE)``.  ``_imrotate``
is A/B'd here against (a) an exact float bilinear replica of that math
and (b) the actual cv2 chain the reference executes (whose bilinear is
5-bit fixed point, hence the looser tolerance on smooth images).
"""
import math

import numpy as np
import pytest

from stereotracking_tpu.models.sot.prdimp import _imrotate


def _np_reference(img, angle):
    """Exact float bilinear of the mmcv.imrotate transform."""
    h, w = img.shape[:2]
    cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
    a = math.radians(-angle)
    ca, sa = math.cos(a), math.sin(a)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing='ij')
    sx = ca * (xs - cx) - sa * (ys - cy) + cx
    sy = sa * (xs - cx) + ca * (ys - cy) + cy
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx, fy = (sx - x0)[..., None], (sy - y0)[..., None]
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
    y0c, y1c = np.clip(y0, 0, h - 1), np.clip(y0 + 1, 0, h - 1)
    v00, v01 = img[y0c, x0c], img[y0c, x1c]
    v10, v11 = img[y1c, x0c], img[y1c, x1c]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


@pytest.mark.parametrize('angle', [10., -10., 45., -45., 90., 7.3])
def test_imrotate_exact_math(angle):
    rng = np.random.RandomState(0)
    img = rng.rand(37, 53, 3).astype(np.float32) * 255
    got = np.asarray(_imrotate(img, angle))
    ref = _np_reference(img.astype(np.float64), angle)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize('angle', [10., -10., 45., -45.])
def test_imrotate_matches_cv2_reference_chain(angle):
    """A/B against the exact library calls mmcv.imrotate makes."""
    cv2 = pytest.importorskip('cv2')
    rng = np.random.RandomState(1)
    # smooth image: cv2's 5-bit fixed-point bilinear error scales with the
    # local gradient; smoothing isolates transform-semantics differences
    img = rng.rand(64, 80, 3).astype(np.float32) * 255
    img = cv2.GaussianBlur(img, (9, 9), 3.0)
    h, w = img.shape[:2]
    matrix = cv2.getRotationMatrix2D(((w - 1) * 0.5, (h - 1) * 0.5),
                                     -angle, 1.0)
    ref = cv2.warpAffine(img, matrix, (w, h),
                         flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REPLICATE)
    got = np.asarray(_imrotate(img, angle))
    assert np.max(np.abs(got - ref)) < 1.5          # 0-255 scale
    assert np.mean(np.abs(got - ref)) < 0.1


def test_init_includes_rotations():
    """The tracker init consumes one augmented sample per configured
    rotation angle (reference sample count: identity + 4 shifts + flip +
    blurs + rotations [+ feature dropouts])."""
    import jax
    import jax.numpy as jnp

    from stereotracking_tpu.apis.inference import init_sot_model

    model = init_sot_model(
        'prdimp', img_sample_size=96, sample_memory_size=32,
        init_update_iters=1, update_iters=1)
    cfg = model.cfg
    n_aug = (1 + len(cfg.relative_shifts) + 1 + len(cfg.blur_sigmas)
             + len(cfg.rotate_angles))
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (120, 160, 3)).astype(np.float32)
    state = model.init(img, np.asarray([40., 30., 80., 70.]))
    n_init = int(np.asarray(state.memory.num_init))
    assert n_init == n_aug + len(cfg.dropout_probs), \
        (n_init, n_aug, len(cfg.dropout_probs))
