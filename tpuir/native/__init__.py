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
    lib.extract_patches_phase.argtypes = [
        fp, i64, i64, i64, i64p, i64, i64, i64, i64, i64, i64, fp]
    lib.blend_accumulate.argtypes = [fp, fp, i64, i64, i64, fp, i64p, i64, i64, i64, fp]
    lib.blend_accumulate_phase.argtypes = [
        fp, fp, i64, i64, i64, fp, i64p, i64, i64, i64, i64, i64, i64, fp]
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


def _np_s2d(x: np.ndarray, f: int = 2) -> np.ndarray:
    """(n, H, W, c) -> (n, H/f, W/f, f*f*c), phase order (di, dj, c)."""
    n, hf, wf, c = x.shape
    x = x.reshape(n, hf // f, f, wf // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hf // f, wf // f, f * f * c)


def _np_d2s(y: np.ndarray, c: int, f: int = 2) -> np.ndarray:
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, f, f, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, f * h, f * w, c)


def extract_patches_phase(img: np.ndarray, coords, ph: int, pw: int,
                          ph_pad: int, pw_pad: int, f: int = 2) -> np.ndarray:
    """Patch gather fused with zero-pad-to-block and space_to_depth(f).

    img (h, w, c) float32 -> (n, ph_pad/f, pw_pad/f, f*f*c); source region
    (ph, pw) at each coord, the [ph, ph_pad) / [pw, pw_pad) margin is
    zero (the DeblurGANv2 pad_always_block semantics, moved host-side so
    the device program is pad-free in phase-IO mode).
    """
    lib = get_lib()
    coords_arr = np.ascontiguousarray(np.asarray(coords, np.int64))
    n = coords_arr.shape[0]
    h, w, c = img.shape
    if lib is None:
        full = np.zeros((n, ph_pad, pw_pad, c), np.float32)
        for i, (hi, wi) in enumerate(coords):
            full[i, :ph, :pw] = img[hi : hi + ph, wi : wi + pw]
        return _np_s2d(full, f)
    out = np.empty((n, ph_pad // f, pw_pad // f, f * f * c), np.float32)
    lib.extract_patches_phase(
        _fptr(img), h, w, c,
        coords_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, ph, pw, ph_pad, pw_pad, f, _fptr(out),
    )
    return out


def blend_stitch_phase(preds: np.ndarray, coords, window: np.ndarray,
                       h: int, w: int, ph: int, pw: int,
                       f: int = 2) -> np.ndarray:
    """Phase preds (n, ph_pad/f, pw_pad/f, f*f*c) -> blended (h, w, c).

    The counterpart of blend_stitch for phase-IO models: depth-to-space,
    crop to (ph, pw) and the Gaussian accumulate fuse into one pass.
    """
    lib = get_lib()
    n, hpf, wpf, cf = preds.shape
    c = cf // (f * f)
    coords_arr = np.ascontiguousarray(np.asarray(coords, np.int64))
    out = np.zeros((h, w, c), np.float32)
    wmap = np.zeros((h, w, c), np.float32)
    if lib is None:
        full = _np_d2s(np.ascontiguousarray(preds, np.float32), c, f)
        for (hi, wi), pred in zip(coords, full):
            out[hi : hi + ph, wi : wi + pw] += pred[:ph, :pw] * window
            wmap[hi : hi + ph, wi : wi + pw] += window
        return out / np.maximum(wmap, 1e-8)
    preds = np.ascontiguousarray(preds, np.float32)
    window = np.ascontiguousarray(window, np.float32)
    lib.blend_accumulate_phase(
        _fptr(out), _fptr(wmap), h, w, c, _fptr(preds),
        coords_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, ph, pw, f * hpf, f * wpf, f, _fptr(window),
    )
    lib.blend_normalize(_fptr(out), _fptr(wmap), out.size, 1e-8)
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
