"""Native (C++) host-side image ops, loaded via ctypes.

Build-on-first-import: compiles ``src/imageops.cc`` with g++ into
``_imageops.so`` next to this file (no pip deps, no pybind11 — plain C ABI).
Every entry point has a NumPy fallback in the pure-Python modules, so the
framework works identically when no compiler is available; callers check
:func:`available` or just call the ``ops``/``data`` wrappers which route
automatically.

API (see ``src/imageops.cc``):

- ``matlab_resize(img, (oh, ow))`` — MATLAB-exact bicubic resize (uint8 or
  float HWC/HW), same semantics as ``ops.resize.imresize``.
- ``u8_to_pm1(arr)`` / ``pm1_to_u8(arr)`` — [0,255] uint8 ↔ [-1,1] float32.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "imageops.cc")
_SO = os.path.join(_HERE, "_imageops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _SO, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.matlab_resize_f64.restype = ctypes.c_int
        lib.matlab_resize_u8.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _nthreads() -> int:
    return max(1, os.cpu_count() or 1)


def matlab_resize(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """MATLAB-exact bicubic resize of an HW or HWC array (uint8 → uint8,
    float → float64), computed in native code. Raises RuntimeError when the
    native library is unavailable — use ``ops.resize.imresize`` for the
    auto-fallback entry point."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native imageops unavailable")
    oh, ow = int(out_hw[0]), int(out_hw[1])
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    h, w, c = x.shape
    nt = _nthreads()
    if img.dtype == np.uint8:
        src = np.ascontiguousarray(x)
        out = np.empty((oh, ow, c), np.uint8)
        rc = lib.matlab_resize_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c, oh, ow,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nt,
        )
    else:
        src = np.ascontiguousarray(x, np.float64)
        out = np.empty((oh, ow, c), np.float64)
        rc = lib.matlab_resize_f64(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), h, w, c, oh, ow,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nt,
        )
    if rc:
        raise RuntimeError(f"native resize failed (rc={rc})")
    return out[..., 0] if squeeze else out


def u8_to_pm1(arr: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(arr, np.uint8)
    if lib is None:
        return src.astype(np.float32) / 127.5 - 1.0
    out = np.empty(src.shape, np.float32)
    lib.u8_to_pm1(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.size, _nthreads(),
    )
    return out


def pm1_to_u8(arr: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(arr, np.float32)
    if lib is None:
        return np.rint(np.clip((src + 1.0) * 127.5, 0, 255)).astype(np.uint8)
    out = np.empty(src.shape, np.uint8)
    lib.pm1_to_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.size, _nthreads(),
    )
    return out
