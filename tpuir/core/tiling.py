"""Patch-grid tiling and Gaussian blend windows.

Semantics match the reference engine's KAIR-style tile index lists
(/root/reference/src/utils.py:384-388) and 2-D Gaussian blending window
(/root/reference/src/utils.py:314-350, sigma_scale=0.125). Both are pure
host-side NumPy: the index lists become static constants of the jitted
patch pipeline, which is the TPU-native analogue of the reference's
per-patch Python loop.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def tile_indices(
    h: int, w: int, patch_size: int | None, patch_overlap: int = 32
) -> Tuple[int, List[int], List[int]]:
    """Compute the effective patch size and top-left tile coordinates.

    Returns (patch_size, h_idx_list, w_idx_list). Every tile slice
    ``img[i:i+ps, j:j+ps]`` then has the uniform shape
    (min(ps, h), min(ps, w)) — edge tiles shift their origin back instead of
    shrinking, which is what makes one compiled model shape per image
    possible on TPU.
    """
    if patch_size:
        ps = min(patch_size, max(h, w))
        stride = max(ps - patch_overlap, 1)
        h_idx_list = list(range(0, h - ps, stride)) + [max(h - ps, 0)]
        w_idx_list = list(range(0, w - ps, stride)) + [max(w - ps, 0)]
        return ps, h_idx_list, w_idx_list
    return max(h, w), [0], [0]


def gaussian_window(
    height: int, width: int, n_channels: int = 3, sigma_scale: float = 0.125
) -> np.ndarray:
    """2-D Gaussian blending window of shape (height, width, n_channels).

    The window peaks at the patch center (center = size/2, note: not the
    (size-1)/2 pixel center — kept identical to the reference) and decays
    with sigma = size * sigma_scale per axis. Edge tiles reuse the
    top-left-cropped window.
    """
    y = np.arange(height, dtype=np.float64)
    x = np.arange(width, dtype=np.float64)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    cy, cx = height / 2.0, width / 2.0
    sy, sx = height * sigma_scale, width * sigma_scale
    g = np.exp(-((yy - cy) ** 2 / (2.0 * sy**2) + (xx - cx) ** 2 / (2.0 * sx**2)))
    g = np.repeat(g[:, :, None], n_channels, axis=2)
    return g.astype(np.float32)
