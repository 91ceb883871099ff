"""Seeded AWGN degradation with bit-exact NumPy MT19937 parity.

The reference resets ``np.random.seed(0)`` on *every* call and adds
N(0, sigma/255) noise (/root/reference/src/utils.py:29-36), so every patch of
a given shape receives the *identical* float64 noise field. That quirk is
load-bearing for PSNR parity, and it is also a gift for the batched TPU
engine: the noise field is computed once per patch shape on the host and
broadcast across the whole patch batch on device.
"""

from __future__ import annotations

import numpy as np


def gaussian_noise_field(shape, sigma: float) -> np.ndarray:
    """The exact float64 noise field the reference adds to each patch."""
    rng = np.random.RandomState(0)  # same MT19937 stream as np.random.seed(0)
    return rng.normal(0.0, float(sigma) / 255.0, shape)


def add_gaussian_noise(img: np.ndarray, sigma: float = 15) -> np.ndarray:
    """Bit-exact port of the reference's add_gaussian_noise.

    Accepts uint8 (scaled to [0,1]) or float input; returns float32 in [0,1].
    The float64 noise is added in float64 and the sum cast to float32, which
    reproduces NumPy's in-place ``float32 += float64`` buffering semantics.
    """
    if img.dtype != np.float32 and img.dtype != np.float64:
        img = img.astype(np.float32) / 255.0
    noise = gaussian_noise_field(img.shape, sigma)
    out = (img.astype(np.float64) + noise).astype(img.dtype)
    out = np.clip(out, 0, 1)
    return out.astype(np.float32)


def add_noise_batched(patches: np.ndarray, sigma: float) -> np.ndarray:
    """Apply the reference's per-patch seeded AWGN to a (N, h, w, C) batch.

    Equivalent to calling :func:`add_gaussian_noise` on every patch — the
    seed reset makes the noise field common across the batch.
    """
    noise = gaussian_noise_field(patches.shape[1:], sigma)
    out = (patches.astype(np.float64) + noise[None]).astype(np.float32)
    return np.clip(out, 0, 1).astype(np.float32)
