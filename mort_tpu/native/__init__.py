"""Native (C++) runtime helpers, exposed over ctypes.

Built with ``make -C mort_tpu/native`` (g++ -O3 -shared); loading falls
back to pure-Python implementations when the shared library is absent, and
an automatic one-shot build is attempted on first import.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmort_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mort_build_bvh.restype = ctypes.c_int
        lib.mort_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def build_bvh_native(leaf_min: np.ndarray, leaf_max: np.ndarray):
    """Run the C++ BVH builder; returns (node_min, node_max, left, right,
    is_leaf) or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = leaf_min.shape[0]
    cap = max(2 * n, 1)
    lmin = np.ascontiguousarray(leaf_min, np.float32)
    lmax = np.ascontiguousarray(leaf_max, np.float32)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    is_leaf = np.empty(cap, np.uint8)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    up = ctypes.POINTER(ctypes.c_uint8)
    count = lib.mort_build_bvh(
        lmin.ctypes.data_as(fp), lmax.ctypes.data_as(fp), n, cap,
        node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
        left.ctypes.data_as(ip), right.ctypes.data_as(ip),
        is_leaf.ctypes.data_as(up))
    if count < 0:
        return None
    return (node_min[:count], node_max[:count], left[:count], right[:count],
            is_leaf[:count].astype(bool))
