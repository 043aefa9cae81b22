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
