"""ctypes bindings for the native host-side library (native/riggs_native.cpp).

Auto-builds with make on first import if the .so is missing and a compiler is
available; every entry point has a pure-python fallback, so the package works
without the native library (just slower host-side data prep).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libriggs_native.so"
_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.zhang_suen_thin.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.zhang_suen_thin.restype = ctypes.c_int
    lib.prim_mst.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.floyd_warshall.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.farthest_point_sample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def zhang_suen_thin(mask: np.ndarray, max_iter: int = 200) -> np.ndarray:
    """Binary mask -> thinned skeleton (bool). Native when possible."""
    lib = _load()
    img = np.ascontiguousarray((np.asarray(mask) > 0.5).astype(np.uint8))
    if lib is None:
        from riggs_tpu.data.thinning import zhang_suen_thin as _py

        return _py(img, max_iter)
    h, w = img.shape
    lib.zhang_suen_thin(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, max_iter)
    return img.astype(bool)


def prim_mst(cost: np.ndarray, init_id: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        from riggs_tpu.skeleton.mst import prim_mst as _py

        return _py(cost, init_id)
    cost = np.ascontiguousarray(np.asarray(cost, np.float32))
    n = cost.shape[0]
    parents = np.empty(n, np.int32)
    lib.prim_mst(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, init_id,
        parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return parents.astype(np.int64)


def floyd_warshall(dist: np.ndarray) -> np.ndarray:
    lib = _load()
    d = np.ascontiguousarray(np.asarray(dist, np.float32)).copy()
    n = d.shape[0]
    if lib is None:
        for k in range(n):
            d = np.minimum(d, d[:, k, None] + d[None, k, :])
        return d
    lib.floyd_warshall(d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return d


def farthest_point_sample(points: np.ndarray, k: int, init_idx: int = 0) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(np.asarray(points, np.float32))
    n = pts.shape[0]
    if lib is None:
        from riggs_tpu.ops.fps import farthest_point_sample as _jx
        import jax.numpy as jnp

        return np.asarray(_jx(jnp.asarray(pts), k, init_idx=init_idx))
    out = np.empty(k, np.int32)
    lib.farthest_point_sample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, k, init_idx,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out.astype(np.int64)
