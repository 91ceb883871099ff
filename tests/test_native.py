"""Native tile/blend library vs the NumPy reference implementation."""

import numpy as np
import pytest

from tpuir import native
from tpuir.core.tiling import gaussian_window


def test_native_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; NumPy fallback covers functionality")


def test_extract_and_blend_match_numpy():
    rng = np.random.RandomState(0)
    img = rng.rand(50, 64, 3).astype(np.float32)
    coords = [(0, 0), (0, 32), (18, 0), (18, 32)]
    ph = pw = 32
    window = gaussian_window(ph, pw, 3)

    got_p = native.extract_patches(img, coords, ph, pw)
    want_p = np.stack([img[h : h + ph, w : w + pw] for h, w in coords])
    np.testing.assert_array_equal(got_p, want_p)

    preds = rng.rand(4, ph, pw, 3).astype(np.float32)
    got = native.blend_stitch(preds, coords, window, 50, 64)
    out = np.zeros((50, 64, 3), np.float32)
    wmap = np.zeros((50, 64, 3), np.float32)
    for (h, w), pred in zip(coords, preds):
        out[h : h + ph, w : w + pw] += pred * window
        wmap[h : h + ph, w : w + pw] += window
    want = out / np.maximum(wmap, 1e-8)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
