"""Framework metrics vs the reference BasicSR psnr_ssim implementation."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from tests import oracle
from tpuir.train.metrics import calculate_psnr, calculate_ssim, bgr2ycbcr


def _load_ref_metrics():
    base = "/root/reference/src/mair"
    oracle._ensure_pkg("mair", base)
    oracle._ensure_pkg("mair.basicsr", f"{base}/basicsr")
    oracle._ensure_pkg("mair.basicsr.utils", f"{base}/basicsr/utils")
    oracle._ensure_pkg("mair.basicsr.metrics", f"{base}/basicsr/metrics")
    reg = oracle._load_by_path(
        "mair.basicsr.utils.registry", f"{base}/basicsr/utils/registry.py"
    )
    sys.modules["mair.basicsr.utils"].registry = reg
    mf = oracle._load_by_path(
        "mair.basicsr.utils.matlab_functions",
        f"{base}/basicsr/utils/matlab_functions.py",
    )
    sys.modules["mair.basicsr.utils"].matlab_functions = mf
    mu = oracle._load_by_path(
        "mair.basicsr.metrics.metric_util", f"{base}/basicsr/metrics/metric_util.py"
    )
    sys.modules["mair.basicsr.metrics"].metric_util = mu
    return oracle._load_by_path(
        "mair.basicsr.metrics.psnr_ssim", f"{base}/basicsr/metrics/psnr_ssim.py"
    )


@pytest.mark.parametrize("crop,y", [(0, False), (4, False), (0, True), (4, True)])
def test_psnr_ssim_match_reference(crop, y):
    ref = _load_ref_metrics()
    rng = np.random.RandomState(0)
    a = (rng.rand(48, 56, 3) * 255).round().astype(np.float64)
    b = np.clip(a + rng.randn(48, 56, 3) * 12, 0, 255).round()

    # The reference converts to Y in float32; ours stays float64, so the
    # y-channel paths agree to fp32 rounding only.
    tol = 1e-4 if y else 1e-8
    got_p = calculate_psnr(a, b, crop_border=crop, test_y_channel=y)
    want_p = ref.calculate_psnr(a, b, crop_border=crop, test_y_channel=y)
    assert abs(got_p - want_p) < tol

    got_s = calculate_ssim(a, b, crop_border=crop, test_y_channel=y)
    want_s = ref.calculate_ssim(a, b, crop_border=crop, test_y_channel=y)
    assert abs(got_s - want_s) < tol


def test_bgr2ycbcr_matches_reference():
    ref = _load_ref_metrics()
    import mair.basicsr.utils.matlab_functions as mf

    rng = np.random.RandomState(1)
    img = rng.rand(8, 9, 3).astype(np.float64)
    np.testing.assert_allclose(
        bgr2ycbcr(img, y_only=True), mf.bgr2ycbcr(img.astype(np.float32), y_only=True),
        rtol=1e-5, atol=1e-4,
    )
