"""NHWC pixel shuffle / unshuffle with torch-identical channel ordering.

torch.nn.PixelUnshuffle(r): (B, C, H*r, W*r) -> (B, C*r^2, H, W), output
channel index c*r^2 + i*r + j for spatial offset (i, j). PixelShuffle is the
inverse. Used by Restormer's and MaIRUNet's resizing modules
(/root/reference/src/restormer/restormer.py:171-189). Keeping the exact
channel order is what makes the torch 1x1/3x3 conv weights drop in.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h/r, w/r, c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)
