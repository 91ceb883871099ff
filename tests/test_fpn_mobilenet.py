"""Parity: FPN-MobileNet generator vs the reference (train-mode norms)."""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tpuir.models.deblurgan import fpn_mobilenet as jfpn


def load_reference_fpn_mobilenet():
    base = "/root/reference/src/deblurganv2"
    oracle._ensure_pkg("deblurganv2", base)
    oracle._ensure_pkg("deblurganv2.models", f"{base}/models")
    mnv2 = oracle._load_by_path(
        "deblurganv2.models.mobilenet_v2", f"{base}/models/mobilenet_v2.py"
    )
    import sys

    sys.modules["deblurganv2.models"].mobilenet_v2 = mnv2
    return oracle._load_by_path(
        "deblurganv2.models.fpn_mobilenet", f"{base}/models/fpn_mobilenet.py"
    )


def test_fpn_mobilenet_parity():
    mod = load_reference_fpn_mobilenet()
    oracle.seed_torch(0)
    norm_layer = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=True
    )
    ref = mod.FPNMobileNet(norm_layer=norm_layer, pretrained=False)
    ref.train(True)  # reference serves the generator in train mode
    sd = {f"module.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    model = jfpn.FPNMobileNet()
    params = jfpn.convert_state_dict(sd)

    x = (np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32) - 0.5) * 2
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_fpn_mobilenet_batch_invariance():
    """Our train-mode norms are per-sample, so batching patches is safe."""
    mod = load_reference_fpn_mobilenet()
    oracle.seed_torch(2)
    norm_layer = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=True
    )
    ref = mod.FPNMobileNet(norm_layer=norm_layer, pretrained=False).train(True)
    sd = {f"module.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    model = jfpn.FPNMobileNet()
    params = jfpn.convert_state_dict(sd)

    xs = (np.random.RandomState(3).rand(3, 32, 32, 3).astype(np.float32) - 0.5) * 2
    batched = np.asarray(model.apply(params, xs))
    for i in range(3):
        single = np.asarray(model.apply(params, xs[i : i + 1]))
        np.testing.assert_allclose(batched[i], single[0], atol=1e-5, rtol=1e-5)
