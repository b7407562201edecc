"""Native (C++) host components, bound via ctypes.

The reference ships CUDA native code for its KNN (simple-knn) and
rasterizer; here the rasterizer is Pallas (ops/pallas_composite.py) and
the host-side KNN is C++ (native/simple_knn.cpp), compiled on first use
with g++ and cached next to the source. scipy KDTree remains the
fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "simple_knn.cpp")
_LIB = os.path.join(_DIR, "libsimple_knn.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mean_sq_dist_3nn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.knn_sq_dists.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def mean_sq_dist_3nn_native(points: np.ndarray,
                            window: int = 64) -> Optional[np.ndarray]:
    """distCUDA2 equivalent via the native library; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    lib.mean_sq_dist_3nn(_fptr(pts), pts.shape[0], _fptr(out), window, 0)
    return out


def knn_sq_dists_native(points: np.ndarray, queries: np.ndarray,
                        k: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    qs = np.ascontiguousarray(queries, np.float32)
    out = np.empty((qs.shape[0], k), np.float32)
    lib.knn_sq_dists(_fptr(pts), pts.shape[0], _fptr(qs), qs.shape[0],
                     k, _fptr(out), 0)
    return out
