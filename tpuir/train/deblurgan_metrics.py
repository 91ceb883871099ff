"""DeblurGANv2's own PSNR/SSIM pair and image glue.

Port of /root/reference/src/deblurganv2/util/metrics.py (the third metric
implementation in the reference — distinct from both the harness's skimage
pair and BasicSR's Matlab-faithful pair) and the DeblurModel conversion
helpers (models/models.py:19-31). The SSIM here is the simple
gaussian-window (11, sigma 1.5) map mean over [0,1]-range NCHW tensors with
no data_range handling, exactly as the torch original.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import jax
import numpy as np


def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2)
    )
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """util/metrics.py:22-47 on NHWC float tensors: depthwise 11x11
    gaussian moments with SAME zero padding, C1/C2 for unit range."""
    c = img1.shape[-1]
    w = jnp.asarray(_gaussian_window())[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))

    def blur(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(m)


def psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """util/metrics.py:50-55: uint8-range inputs scored on [0, 1]."""
    mse = float(np.mean((img1 / 255.0 - img2 / 255.0) ** 2))
    if mse == 0:
        return 100.0
    return 20 * math.log10(1.0 / math.sqrt(mse))


def tensor2im(image: np.ndarray, imtype=np.uint8) -> np.ndarray:
    """models/models.py:19-22 for NHWC [-1, 1] tensors: first batch element
    to a uint8 HWC image."""
    img = (np.asarray(image[0], np.float32) + 1) / 2.0 * 255.0
    return img.astype(imtype)


def get_images_and_metrics(inp, output, target):
    """models/models.py:24-31: (psnr, ssim-on-uint8-skimage-style, hstack
    visualization). SSIM here follows the reference call (skimage on the
    uint8 images) — approximated by our gaussian SSIM on [0,1] floats."""
    from tpuir.core.metrics import calculate_metrics

    i = tensor2im(inp)
    f = tensor2im(output)
    r = tensor2im(target)
    p = psnr(f, r)
    _, s = calculate_metrics(f, r)
    return p, s, np.hstack((i, f, r))
