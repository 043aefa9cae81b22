"""ctypes bindings for the native host-side helpers (csrc/).

The shared library is built by ``csrc/build.sh`` (or automatically on first
use if a compiler is available); every entry point has a pure-python/scipy
fallback so the package works without the native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), 'liblapjv.so')
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), 'csrc', 'build.sh')
        try:
            subprocess.run(['sh', build], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lapjv_cost_limit.restype = ctypes.c_int
        lib.lapjv_cost_limit.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.lapjv_square.restype = ctypes.c_int
        lib.lapjv_square.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def lapjv_cost_limit(cost: np.ndarray, cost_limit: float
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side lap.lapjv(extend_cost=True, cost_limit=...) equivalent.

    Uses the C++ solver when built, otherwise a scipy fallback.
    """
    cost = np.ascontiguousarray(cost, np.float64)
    k, n = cost.shape
    lib = _load()
    if lib is not None:
        row = np.empty(k, np.int32)
        col = np.empty(n, np.int32)
        rc = lib.lapjv_cost_limit(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k, n,
            float(cost_limit),
            row.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            col.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if rc == 0:
            return row.astype(np.int64), col.astype(np.int64)
    # scipy fallback (same embedding)
    from scipy.optimize import linear_sum_assignment
    s = k + n
    ext = np.full((s, s), cost_limit / 2.0)
    ext[k:, n:] = 0.0
    ext[:k, :n] = cost
    rr, cc = linear_sum_assignment(ext)
    row = np.full(k, -1, np.int64)
    col = np.full(n, -1, np.int64)
    for r, c in zip(rr, cc):
        if r < k and c < n:
            row[r] = c
            col[c] = r
    return row, col


# ---------------------------------------------------------------------------
# stem-layout packer (csrc/stem_pack.cpp)

_STEM_LIB_PATH = os.path.join(os.path.dirname(__file__), 'libstempack.so')
_stem_lib: Optional[ctypes.CDLL] = None
_stem_tried = False


def _load_stem() -> Optional[ctypes.CDLL]:
    global _stem_lib, _stem_tried
    if _stem_lib is not None or _stem_tried:
        return _stem_lib
    _stem_tried = True
    if not os.path.exists(_STEM_LIB_PATH):
        build = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), 'csrc', 'build.sh')
        try:
            subprocess.run(['sh', build], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_STEM_LIB_PATH)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        u16 = ctypes.POINTER(ctypes.c_uint16)
        lib.stem_pack_u8.restype = None
        lib.stem_pack_u8.argtypes = [u8] + [ctypes.c_int] * 6 + [u8]
        lib.stem_pack_disp_bf16.restype = None
        lib.stem_pack_disp_bf16.argtypes = [u16] + [ctypes.c_int] * 5 + [u16]
        lib.stem_pack_u8_batch.restype = None
        lib.stem_pack_u8_batch.argtypes = [u8] + [ctypes.c_int] * 7 + [u8]
        lib.stem_pack_disp_bf16_batch.restype = None
        lib.stem_pack_disp_bf16_batch.argtypes = \
            [u16] + [ctypes.c_int] * 6 + [u16]
        _stem_lib = lib
    except OSError:
        _stem_lib = None
    return _stem_lib


def stem_pack_u8(img: np.ndarray, wq: int, hp: int = None,
                 wp: int = None) -> np.ndarray:
    """(H, W, C) uint8 -> (HP/4+1, 16C, WQ) uint8 packed stem layout
    (see ops/stem_pallas.stem_pack_np; C++ fast path, numpy fallback).
    hp/wp: model-padded dims (default: H, W)."""
    h, w, c = img.shape
    hp, wp = hp or h, wp or w
    lib = _load_stem()
    if lib is None:
        from ..ops.stem_pallas import stem_pack_np
        pad = np.zeros((hp, wp, c), img.dtype)
        pad[:h, :w] = img
        return stem_pack_np(pad, wq)
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((hp // 4 + 1, 16 * c, wq), np.uint8)
    lib.stem_pack_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        hp, wp, wq, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def stem_pack_disp_bf16(disp: np.ndarray, wq: int, hp: int = None,
                        wp: int = None) -> np.ndarray:
    """(H, W) uint16 fixed-point disparity -> (HP/4+1, 16, WQ) packed
    bf16 (as uint16 bit pattern) of (d==65535 ? 0 : d)/16."""
    h, w = disp.shape
    hp, wp = hp or h, wp or w
    lib = _load_stem()
    if lib is None:
        from ..ops.stem_pallas import stem_pack_np
        d = np.where(disp == 65535, 0, disp).astype(np.float32) / 16.0
        pad = np.zeros((hp, wp, 1), np.float32)
        pad[:h, :w, 0] = d
        packed = stem_pack_np(pad, wq)  # (HQ, 16, WQ) f32
        # f32 -> bf16 bits, round-to-nearest-even (matches XLA astype)
        bits = packed.view(np.uint32)
        lsb = (bits >> 16) & 1
        return ((bits + 0x7fff + lsb) >> 16).astype(np.uint16)
    disp = np.ascontiguousarray(disp, np.uint16)
    out = np.empty((hp // 4 + 1, 16, wq), np.uint16)
    lib.stem_pack_disp_bf16(
        disp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w,
        hp, wp, wq, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out


def stem_pack_u8_batch(imgs: np.ndarray, wq: int, hp: int = None,
                       wp: int = None, out: np.ndarray = None) -> np.ndarray:
    """(S, H, W, C) uint8 -> (S, HP/4+1, 16C, WQ) packed stem layout in one
    native call (whole stream batch; no per-frame python round trips).
    ``out``: optional preallocated destination (reused across steps by the
    pipelined server so packing never allocates)."""
    s, h, w, c = imgs.shape
    hp, wp = hp or h, wp or w
    lib = _load_stem()
    if lib is None:
        return np.stack([stem_pack_u8(imgs[i], wq, hp, wp)
                         for i in range(s)])
    imgs = np.ascontiguousarray(imgs, np.uint8)
    if out is None:
        out = np.empty((s, hp // 4 + 1, 16 * c, wq), np.uint8)
    lib.stem_pack_u8_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), s, h, w, c,
        hp, wp, wq, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def stem_pack_disp_bf16_batch(disps: np.ndarray, wq: int, hp: int = None,
                              wp: int = None,
                              out: np.ndarray = None) -> np.ndarray:
    """(S, H, W) uint16 -> (S, HP/4+1, 16, WQ) packed bf16 bit patterns."""
    s, h, w = disps.shape
    hp, wp = hp or h, wp or w
    lib = _load_stem()
    if lib is None:
        return np.stack([stem_pack_disp_bf16(disps[i], wq, hp, wp)
                         for i in range(s)])
    disps = np.ascontiguousarray(disps, np.uint16)
    if out is None:
        out = np.empty((s, hp // 4 + 1, 16, wq), np.uint16)
    lib.stem_pack_disp_bf16_batch(
        disps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), s, h, w,
        hp, wp, wq, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out
