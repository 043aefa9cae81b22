"""Exact PrRoIPool vs an independent dense-quadrature oracle.

The oracle evaluates the PrRoIPool definition directly: midpoint-rule
numerical integration of the bilinear interpolation (zero outside the
map, pixel centers at integer coordinates) over each output bin —
no shared code with ``ops/prroi_pool.py``'s closed form.
"""
import numpy as np
import jax
import jax.numpy as jnp

from stereotracking_tpu.ops.prroi_pool import prroi_pool


def _bilinear_zero_outside(feat: np.ndarray, y: np.ndarray, x: np.ndarray):
    """feat (H, W); y/x arbitrary-shape continuous coords."""
    h, w = feat.shape
    padded = np.zeros((h + 3, w + 3), feat.dtype)
    padded[1:h + 1, 1:w + 1] = feat
    # clip so that out-of-range interpolates against zeros
    yc = np.clip(y, -1.0, h * 1.0)
    xc = np.clip(x, -1.0, w * 1.0)
    y0 = np.floor(yc).astype(int)
    x0 = np.floor(xc).astype(int)
    fy = yc - y0
    fx = xc - x0
    v00 = padded[y0 + 1, x0 + 1]
    v01 = padded[y0 + 1, x0 + 2]
    v10 = padded[y0 + 2, x0 + 1]
    v11 = padded[y0 + 2, x0 + 2]
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def _oracle(feat: np.ndarray, rois: np.ndarray, out_size: int,
            spatial_scale: float, n_samp: int = 160) -> np.ndarray:
    h, w, c = feat.shape
    out = np.zeros((len(rois), out_size, out_size, c))
    for r, roi in enumerate(rois * spatial_scale):
        x1, y1, x2, y2 = roi
        bw = (x2 - x1) / out_size
        bh = (y2 - y1) / out_size
        if bw * bh <= 0:
            continue
        for by in range(out_size):
            for bx in range(out_size):
                xs = x1 + bw * (bx + (np.arange(n_samp) + 0.5) / n_samp)
                ys = y1 + bh * (by + (np.arange(n_samp) + 0.5) / n_samp)
                gy, gx = np.meshgrid(ys, xs, indexing='ij')
                for ch in range(c):
                    vals = _bilinear_zero_outside(feat[:, :, ch], gy, gx)
                    out[r, by, bx, ch] = vals.mean()
    return out


def test_matches_quadrature_oracle():
    rng = np.random.RandomState(0)
    feat = rng.randn(9, 11, 2).astype(np.float32)
    rois = np.array([
        [4.0, 2.0, 36.0, 30.0],        # interior (scale 1/4)
        [1.3, 0.7, 17.9, 25.2],        # fractional bounds
        [-8.0, -6.0, 20.0, 16.0],      # overlaps the top-left border
        [24.0, 20.0, 60.0, 48.0],      # overruns bottom-right (zeros)
    ], np.float32)
    got = np.asarray(prroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                out_size=3, spatial_scale=0.25))
    want = _oracle(feat, rois, 3, 0.25)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_constant_feature_interior_roi():
    feat = np.full((8, 8, 1), 3.5, np.float32)
    rois = np.array([[1.0, 1.0, 6.0, 6.0]], np.float32)
    got = np.asarray(prroi_pool(jnp.asarray(feat), jnp.asarray(rois), 2))
    np.testing.assert_allclose(got, 3.5, rtol=1e-6)


def test_zero_area_roi_outputs_zero():
    feat = np.random.RandomState(1).randn(6, 6, 1).astype(np.float32)
    rois = np.array([[3.0, 2.0, 3.0, 5.0]], np.float32)
    got = np.asarray(prroi_pool(jnp.asarray(feat), jnp.asarray(rois), 2))
    assert np.all(got == 0.0)


def test_exact_gradient_wrt_roi_coords():
    """The closed form is differentiable in the roi coords (the property
    the IoUNet gradient-ascent refinement needs); check against central
    finite differences of the pooled mean."""
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(10, 10, 3).astype(np.float32))
    roi = jnp.asarray([2.3, 1.7, 7.9, 8.4])

    def pooled_sum(r):
        return prroi_pool(feat, r[None], 3).sum()

    g = jax.grad(pooled_sum)(roi)
    eps = 1e-3
    for k in range(4):
        d = jnp.zeros(4).at[k].set(eps)
        num = (pooled_sum(roi + d) - pooled_sum(roi - d)) / (2 * eps)
        np.testing.assert_allclose(g[k], num, rtol=2e-3, atol=2e-3)
