"""DeblurGANv2 util/metrics parity (torch oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests import oracle
from tpuir.train import deblurgan_metrics as jm


@pytest.fixture(scope="module")
def ref_metrics():
    base = "/root/reference/src/deblurganv2"
    oracle._ensure_pkg("deblurganv2", base)
    oracle._ensure_pkg("deblurganv2.util", f"{base}/util")
    return oracle._load_by_path(
        "deblurganv2.util.metrics", f"{base}/util/metrics.py"
    )


def test_ssim_parity(ref_metrics):
    rng = np.random.RandomState(0)
    a = rng.rand(1, 32, 40, 3).astype(np.float32)
    b = np.clip(a + rng.randn(1, 32, 40, 3).astype(np.float32) * 0.05, 0, 1)
    got = float(jm.ssim(jnp.asarray(a), jnp.asarray(b)))
    ta = torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))
    tb = torch.from_numpy(np.ascontiguousarray(b.transpose(0, 3, 1, 2)))
    want = float(ref_metrics.SSIM(ta, tb))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_psnr_parity(ref_metrics):
    rng = np.random.RandomState(1)
    a = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    b = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    assert jm.psnr(a, b) == pytest.approx(ref_metrics.PSNR(a, b))
    assert jm.psnr(a, a) == 100.0


def test_tensor2im_and_vis():
    x = np.full((2, 4, 4, 3), 0.5, np.float32)
    im = jm.tensor2im(x)
    assert im.dtype == np.uint8 and im.shape == (4, 4, 3)
    assert int(im[0, 0, 0]) == 191  # (0.5+1)/2*255
    y = (np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32) - 0.5) * 2
    p, s, vis = jm.get_images_and_metrics(y, y, y)
    assert p == 100.0 and s == pytest.approx(1.0)
    assert vis.shape == (16, 48, 3)
