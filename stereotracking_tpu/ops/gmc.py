"""Camera-motion estimation on device (the reference's Mesh-Affine CMAC).

The reference estimates a per-frame 4-DoF background affine with OpenCV on
the host: Farneback dense flow on 255x255 hist-equalized grays -> 16px
mesh-median flows -> RANSAC ``estimateAffinePartial2D``
(/root/reference/mmtrack/models/trackers/utils.py:6-55, gmc.py:7-45).  Here
the whole chain is jittable JAX:

* grayscale + average-pool downsample + histogram equalization;
* per-cell integer block matching over a +-search window (vectorized SSD
  over all offsets) with parabolic sub-pixel refinement — the mesh-median
  robustification of Farneback is replaced by per-cell matching, which is
  the same signal for a *global* motion model;
* fixed-iteration 2-point RANSAC for the similarity transform with a
  least-squares refit on inliers.

Outputs match the reference contract: a 2x3 affine in original-image pixels
and an inlier ratio; callers treat ratio < min_inlier_ratio as "no warp".
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class GMCConfig(NamedTuple):
    size: int = 256           # downsampled square side
    step: int = 16            # mesh cell size
    search: int = 8           # +- search radius (pixels, downsampled)
    ransac_iters: int = 128
    ransac_thr: float = 5.0   # reprojection threshold, original pixels
    min_inlier_ratio: float = 0.3
    backend: str = 'device'   # 'device' (this module) | 'opencv' (exact
                              # reference chain, ops/gmc_host.py)


def to_small_gray(img_bgr: jnp.ndarray, size: int = 256) -> jnp.ndarray:
    """(H, W, 3) BGR float -> (size, size) equalized gray uint8-valued f32."""
    h, w = img_bgr.shape[:2]
    gray = (0.114 * img_bgr[..., 0] + 0.587 * img_bgr[..., 1] +
            0.299 * img_bgr[..., 2])
    # average-pool to a multiple of size, then strided exact resize
    ph = -(-h // size) * size
    pw = -(-w // size) * size
    gray = jnp.pad(gray, ((0, ph - h), (0, pw - w)), mode='edge')
    gray = gray.reshape(size, ph // size, size, pw // size).mean((1, 3))
    gray = jnp.clip(gray, 0, 255)

    # histogram equalization (cv2.equalizeHist semantics on uint8 values)
    g8 = jnp.floor(gray).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    counts = jnp.sum(g8[:, :, None] == bins[None, None, :], axis=(0, 1))
    cdf = jnp.cumsum(counts)
    nonzero_min = jnp.min(jnp.where(counts > 0, cdf, cdf[-1]))
    total = cdf[-1]
    lut = jnp.round((cdf - nonzero_min) / jnp.maximum(
        total - nonzero_min, 1) * 255.0)
    lut = jnp.clip(lut, 0, 255)
    return lut[g8].astype(jnp.float32)


def mesh_block_flow(prev: jnp.ndarray, curr: jnp.ndarray,
                    step: int = 16, search: int = 8
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integer block matching per mesh cell with sub-pixel refinement.

    Returns (src (M, 2), flow (M, 2)) in downsampled pixel coordinates,
    where src are cell centers.
    """
    s = prev.shape[0]
    g = s // step
    curr_pad = jnp.pad(curr, search, mode='edge')

    cells = prev.reshape(g, step, g, step).transpose(0, 2, 1, 3)  # (g,g,p,p)

    offs = jnp.arange(-search, search + 1)

    def ssd_for_offset(dy, dx):
        shifted = jax.lax.dynamic_slice(
            curr_pad, (search + dy, search + dx), (s, s))
        sc = shifted.reshape(g, step, g, step).transpose(0, 2, 1, 3)
        return jnp.sum((cells - sc) ** 2, axis=(2, 3))  # (g, g)

    ssd = jax.vmap(lambda dy: jax.vmap(
        lambda dx: ssd_for_offset(dy, dx))(offs))(offs)   # (S, S, g, g)
    n_off = 2 * search + 1
    flat = ssd.reshape(n_off * n_off, g, g)
    best = jnp.argmin(flat, axis=0)                      # (g, g)
    by, bx = best // n_off, best % n_off

    # parabolic sub-pixel refinement per axis
    def sub(axis_idx, other_idx, along_y):
        i = jnp.clip(axis_idx, 1, n_off - 2)
        if along_y:
            c0 = ssd[i - 1, other_idx, _gy, _gx]
            c1 = ssd[i, other_idx, _gy, _gx]
            c2 = ssd[i + 1, other_idx, _gy, _gx]
        else:
            c0 = ssd[other_idx, i - 1, _gy, _gx]
            c1 = ssd[other_idx, i, _gy, _gx]
            c2 = ssd[other_idx, i + 1, _gy, _gx]
        denom = c0 - 2 * c1 + c2
        frac = jnp.where(jnp.abs(denom) > 1e-6,
                         0.5 * (c0 - c2) / jnp.maximum(denom, 1e-6), 0.0)
        return i.astype(jnp.float32) + jnp.clip(frac, -0.5, 0.5)

    _gy, _gx = jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing='ij')
    fy = sub(by, bx, True) - search
    fx = sub(bx, by, False) - search

    ys, xs = jnp.meshgrid((jnp.arange(g) + 0.5) * step,
                          (jnp.arange(g) + 0.5) * step, indexing='ij')
    src = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    flow = jnp.stack([fx.reshape(-1), fy.reshape(-1)], axis=-1)
    return src, flow


def _similarity_from_pairs(p1, p2, q1, q2):
    """4-DoF transform mapping (p1, p2) -> (q1, q2), complex closed form."""
    pz = (p2[0] - p1[0]) + 1j * (p2[1] - p1[1])
    qz = (q2[0] - q1[0]) + 1j * (q2[1] - q1[1])
    a = qz / jnp.where(jnp.abs(pz) < 1e-9, 1e-9, pz)
    tx = q1[0] - (jnp.real(a) * p1[0] - jnp.imag(a) * p1[1])
    ty = q1[1] - (jnp.imag(a) * p1[0] + jnp.real(a) * p1[1])
    return jnp.array([[jnp.real(a), -jnp.imag(a), tx],
                      [jnp.imag(a), jnp.real(a), ty]])


def _similarity_lstsq(src, dst, w):
    """Weighted least-squares 4-DoF fit: dst ~ [a -b; b a] src + t."""
    sw = jnp.maximum(jnp.sum(w), 1e-6)
    mx = jnp.sum(w * src[:, 0]) / sw
    my = jnp.sum(w * src[:, 1]) / sw
    nx = jnp.sum(w * dst[:, 0]) / sw
    ny = jnp.sum(w * dst[:, 1]) / sw
    sx, sy = src[:, 0] - mx, src[:, 1] - my
    dx, dy = dst[:, 0] - nx, dst[:, 1] - ny
    denom = jnp.sum(w * (sx * sx + sy * sy)) + 1e-9
    a = jnp.sum(w * (sx * dx + sy * dy)) / denom
    b = jnp.sum(w * (sx * dy - sy * dx)) / denom
    tx = nx - (a * mx - b * my)
    ty = ny - (b * mx + a * my)
    return jnp.array([[a, -b, tx], [b, a, ty]])


def ransac_similarity(src: jnp.ndarray, dst: jnp.ndarray, key: jax.Array,
                      iters: int = 128, thr: float = 5.0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration RANSAC 2x3 similarity; returns (warp, inlier_ratio)."""
    n = src.shape[0]
    idx = jax.random.randint(key, (iters, 2), 0, n)

    def hypothesis(pair):
        i, j = pair[0], pair[1]
        H = _similarity_from_pairs(src[i], src[j], dst[i], dst[j])
        pred = src @ H[:, :2].T + H[:, 2]
        err = jnp.sum((pred - dst) ** 2, axis=-1)
        inl = err < thr * thr
        return jnp.sum(inl), inl

    scores, inls = jax.vmap(hypothesis)(idx)
    best = jnp.argmax(scores)
    w = inls[best].astype(jnp.float32)
    H = _similarity_lstsq(src, dst, w)
    # refit once more with refined inliers
    pred = src @ H[:, :2].T + H[:, 2]
    w2 = (jnp.sum((pred - dst) ** 2, -1) < thr * thr).astype(jnp.float32)
    H = _similarity_lstsq(src, dst, jnp.maximum(w2, 0.0))
    ratio = jnp.sum(w2) / n
    return H, ratio


@partial(jax.jit, static_argnames=('cfg',))
def estimate_camera_motion(prev_small: jnp.ndarray, curr_small: jnp.ndarray,
                           ori_h: jnp.ndarray | int, ori_w: jnp.ndarray | int,
                           key: jax.Array, cfg: GMCConfig = GMCConfig()
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full chain on downsampled grays -> (2x3 warp in ORIGINAL pixels,
    inlier ratio). Caller gates on ratio >= cfg.min_inlier_ratio."""
    src_s, flow_s = mesh_block_flow(prev_small, curr_small, cfg.step,
                                    cfg.search)
    fx = jnp.asarray(ori_w, jnp.float32) / cfg.size
    fy = jnp.asarray(ori_h, jnp.float32) / cfg.size
    scale = jnp.array([fx, fy])
    src = src_s * scale
    dst = (src_s + flow_s) * scale
    return ransac_similarity(src, dst, key, cfg.ransac_iters, cfg.ransac_thr)


def apply_warp_to_tracks(mean: jnp.ndarray, cov: jnp.ndarray,
                         warp: jnp.ndarray, mask: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a 2x3 similarity to cxcyah Kalman states where ``mask``
    (reference apply_gmc_to_tracks_cxcyah, gmc.py:20-45)."""
    R = warp[:2, :2]
    t = warp[:, 2]
    s = jnp.sqrt(jnp.maximum(jnp.linalg.det(R), 1e-12))
    new_mean = mean
    new_mean = new_mean.at[:, 0:2].set(mean[:, 0:2] @ R.T + t)
    new_mean = new_mean.at[:, 3].set(mean[:, 3] * s)
    new_mean = new_mean.at[:, 4:6].set(mean[:, 4:6] @ R.T)
    new_mean = new_mean.at[:, 7].set(mean[:, 7] * s)

    R8 = jnp.eye(8)
    R8 = R8.at[0:2, 0:2].set(R).at[4:6, 4:6].set(R)
    R8 = R8.at[3, 3].set(s).at[7, 7].set(s)
    new_cov = R8 @ cov @ R8.T

    mean = jnp.where(mask[:, None], new_mean, mean)
    cov = jnp.where(mask[:, None, None], new_cov, cov)
    return mean, cov
