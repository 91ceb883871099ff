"""PSNR and SSIM with scikit-image-identical semantics.

scikit-image is not available in this environment, so these are standalone
re-implementations of the exact algorithms the reference harness scores with
(/root/reference/src/utils.py:134-156): `peak_signal_noise_ratio` and
`structural_similarity` at default settings (win_size=7 uniform filter,
sample covariance, border crop of (win_size-1)//2, K1=0.01, K2=0.03).
The harness's skimage pair is the parity target, so the math here follows
the published algorithm step for step in float64.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def psnr(target: np.ndarray, pred: np.ndarray, data_range: float) -> float:
    t = target.astype(np.float64)
    p = pred.astype(np.float64)
    mse = np.mean((t - p) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10((float(data_range) ** 2) / mse))


def _ssim_single(
    im1: np.ndarray,
    im2: np.ndarray,
    data_range: float,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = win_size ** im1.ndim
    cov_norm = NP / (NP - 1)  # sample covariance
    filt = lambda x: uniform_filter(x, size=win_size)  # noqa: E731

    ux = filt(im1)
    uy = filt(im2)
    uxx = filt(im1 * im1)
    uyy = filt(im2 * im2)
    uxy = filt(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    R = float(data_range)
    C1 = (k1 * R) ** 2
    C2 = (k2 * R) ** 2
    A1 = 2.0 * ux * uy + C1
    A2 = 2.0 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, s - pad) for s in S.shape)
    return float(S[crop].mean())


def ssim(
    target: np.ndarray,
    pred: np.ndarray,
    data_range: float,
    channel_axis: int | None = None,
    win_size: int = 7,
) -> float:
    if channel_axis is not None:
        n_ch = target.shape[channel_axis]
        vals = [
            _ssim_single(
                np.take(target, c, axis=channel_axis),
                np.take(pred, c, axis=channel_axis),
                data_range,
                win_size,
            )
            for c in range(n_ch)
        ]
        return float(np.mean(vals))
    return _ssim_single(target, pred, data_range, win_size)


def calculate_metrics(
    pred: np.ndarray, target: np.ndarray, data_range: float | None = None
):
    """(PSNR, SSIM) with the reference harness's dtype-derived data range."""
    if data_range is None:
        if pred.dtype == np.uint8:
            data_range = 255
        elif pred.dtype == np.uint16:
            data_range = 65535
        else:
            data_range = 1.0

    psnr_value = psnr(target, pred, data_range=data_range)
    if pred.ndim == 3 and pred.shape[2] == 3:
        ssim_value = ssim(target, pred, data_range=data_range, channel_axis=2)
    elif pred.ndim == 3 and pred.shape[2] == 1:
        ssim_value = ssim(target[:, :, 0], pred[:, :, 0], data_range=data_range)
    else:
        ssim_value = ssim(target, pred, data_range=data_range)
    return psnr_value, ssim_value
