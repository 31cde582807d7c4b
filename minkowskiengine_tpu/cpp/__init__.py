"""Native host engine loader: builds (once) and binds hostengine.cpp.

The shared library is compiled on first use with the system g++ and cached
next to the source; everything falls back to numpy if no compiler is
available (see utils/quantization.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostengine.cpp")
_LIB = os.path.join(_DIR, "_hostengine.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        _LIB,
        _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The hostengine library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            # a stale/foreign-platform binary (e.g. copied between
            # machines): rebuild from source once before giving up
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB)
            except OSError:
                return None
        i64, i32p, i64p, f32p, f64p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double),
        )
        lib.me_quantize_i32.restype = i64
        lib.me_quantize_i32.argtypes = [i32p, i64, i64, i64p, i64p]
        lib.me_quantize_f32.restype = i64
        lib.me_quantize_f32.argtypes = [f32p, i64, i64, f64p, i32p, i64p, i64p]
        lib.me_quantize_f64.restype = i64
        lib.me_quantize_f64.argtypes = [f64p, i64, i64, f64p, i32p, i64p, i64p]
        lib.me_quantize_label_i32.restype = i64
        lib.me_quantize_label_i32.argtypes = [
            i32p,
            i32p,
            i64,
            i64,
            ctypes.c_int32,
            i64p,
            i64p,
            i32p,
        ]
        lib.me_batch_floor_f32.restype = None
        lib.me_batch_floor_f32.argtypes = [f32p, i64, i64, ctypes.c_int32, i32p]
        _lib = lib
        return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def quantize_i32(coords: np.ndarray):
    """(unique_map, inverse) over int32 rows; None if hostengine missing."""
    lib = load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    n, d = coords.shape
    unique_map = np.empty(n, np.int64)
    inverse = np.empty(n, np.int64)
    nu = lib.me_quantize_i32(
        _ptr(coords, ctypes.c_int32),
        n,
        d,
        _ptr(unique_map, ctypes.c_int64),
        _ptr(inverse, ctypes.c_int64),
    )
    return unique_map[:nu], inverse


def quantize_label_i32(coords: np.ndarray, labels: np.ndarray, ignore_label: int):
    lib = load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    labels = np.ascontiguousarray(labels, np.int32)
    n, d = coords.shape
    unique_map = np.empty(n, np.int64)
    inverse = np.empty(n, np.int64)
    out_labels = np.empty(n, np.int32)
    nu = lib.me_quantize_label_i32(
        _ptr(coords, ctypes.c_int32),
        _ptr(labels, ctypes.c_int32),
        n,
        d,
        int(ignore_label),
        _ptr(unique_map, ctypes.c_int64),
        _ptr(inverse, ctypes.c_int64),
        _ptr(out_labels, ctypes.c_int32),
    )
    return unique_map[:nu], inverse, out_labels[:nu]
