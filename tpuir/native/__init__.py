"""ctypes bindings for the native host pipeline (native/tileblend.cpp).

Builds the shared library on first use with g++ (cached beside the source);
every entry point has a NumPy fallback, so the framework works without a
compiler. Enable/disable with TPUIR_NATIVE=1/0 (default: use if buildable).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "tileblend.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libtileblend.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        # portable baseline flags: the artifact is never shipped (gitignored,
        # built on first use), but keep it runnable if it ever is copied
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TPUIR_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i64p = ctypes.POINTER(i64)
    lib.extract_patches.argtypes = [fp, i64, i64, i64, i64p, i64, i64, i64, fp]
    lib.blend_accumulate.argtypes = [fp, fp, i64, i64, i64, fp, i64p, i64, i64, i64, fp]
    lib.blend_normalize.argtypes = [fp, fp, i64, ctypes.c_float]
    lib.to_uint8.argtypes = [fp, i64, u8p]
    lib.to_uint16.argtypes = [fp, i64, u16p]
    lib.from_uint8.argtypes = [u8p, i64, fp]
    _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def extract_patches(img: np.ndarray, coords, ph: int, pw: int) -> np.ndarray:
    """img (h, w, c) float32 contiguous -> (n, ph, pw, c)."""
    lib = get_lib()
    coords_arr = np.ascontiguousarray(np.asarray(coords, np.int64))
    n = coords_arr.shape[0]
    if lib is None:
        return np.stack([img[hi : hi + ph, wi : wi + pw] for hi, wi in coords])
    h, w, c = img.shape
    out = np.empty((n, ph, pw, c), np.float32)
    lib.extract_patches(
        _fptr(img), h, w, c,
        coords_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, ph, pw, _fptr(out),
    )
    return out


def blend_stitch(preds: np.ndarray, coords, window: np.ndarray,
                 h: int, w: int) -> np.ndarray:
    """preds (n, ph, pw, c) -> blended (h, w, c) float32."""
    lib = get_lib()
    n, ph, pw, c = preds.shape
    coords_arr = np.ascontiguousarray(np.asarray(coords, np.int64))
    out = np.zeros((h, w, c), np.float32)
    wmap = np.zeros((h, w, c), np.float32)
    if lib is None:
        for (hi, wi), pred in zip(coords, preds):
            out[hi : hi + ph, wi : wi + pw] += pred * window
            wmap[hi : hi + ph, wi : wi + pw] += window
        return out / np.maximum(wmap, 1e-8)
    preds = np.ascontiguousarray(preds, np.float32)
    window = np.ascontiguousarray(window, np.float32)
    lib.blend_accumulate(
        _fptr(out), _fptr(wmap), h, w, c, _fptr(preds),
        coords_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, ph, pw, _fptr(window),
    )
    lib.blend_normalize(_fptr(out), _fptr(wmap), out.size, 1e-8)
    return out
