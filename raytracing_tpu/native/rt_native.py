"""ctypes binding for the native runtime (rt_native.cpp) with automatic
build-on-first-use and silent NumPy fallback when no toolchain exists."""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "librt_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_HERE, "rt_native.cpp")
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           src, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain absent / compile error → fallback
        print(f"rt_native build failed ({e}); using NumPy fallback", file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    # RT_NATIVE=0 is honored per *call*, not only on first load: tests flip
    # it to force the NumPy fallback after the library has been used.
    if os.environ.get("RT_NATIVE", "1") == "0":
        return None
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) or (
        os.path.getmtime(_SO_PATH) < os.path.getmtime(os.path.join(_HERE, "rt_native.cpp"))
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.rt_bvh_build.restype = ctypes.c_int32
    lib.rt_bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rt_write_ppm.restype = ctypes.c_int32
    lib.rt_write_ppm.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bvh_flat(bmin: np.ndarray, bmax: np.ndarray, ids: np.ndarray):
    """(n,3) prim bounds + (n,) global ids → (out_min, out_max, prim, miss)
    flat skip-link arrays, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(ids)
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    ids = np.ascontiguousarray(ids, np.int32)
    k = 2 * n - 1
    out_min = np.empty((k, 3), np.float32)
    out_max = np.empty((k, 3), np.float32)
    out_prim = np.empty(k, np.int32)
    out_miss = np.empty(k, np.int32)
    got = lib.rt_bvh_build(_fptr(bmin), _fptr(bmax), _iptr(ids), n,
                           _fptr(out_min), _fptr(out_max),
                           _iptr(out_prim), _iptr(out_miss))
    if got != k:
        return None
    return out_min, out_max, out_prim, out_miss


def write_ppm(path: str, img_u8: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img_u8, np.uint8)
    h, w, _ = img.shape
    rc = lib.rt_write_ppm(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w
    )
    return rc == 0
