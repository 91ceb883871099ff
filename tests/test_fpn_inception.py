"""Parity: FPN-Inception generator vs the reference wired to a torch
Inception-ResNet-v2 trunk (timm stand-in with checkpoint-faithful naming)."""

import functools
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tests.inception_torch import fake_timm_module
from tpuir.models.deblurgan import fpn_inception as jfpn


def load_reference_fpn_inception():
    if "timm" not in sys.modules or not hasattr(sys.modules["timm"], "create_model"):
        sys.modules["timm"] = fake_timm_module()
    if "torchsummary" not in sys.modules:
        import types

        ts = types.ModuleType("torchsummary")
        ts.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = ts
    base = "/root/reference/src/deblurganv2"
    oracle._ensure_pkg("deblurganv2", base)
    oracle._ensure_pkg("deblurganv2.models", f"{base}/models")
    return oracle._load_by_path(
        "deblurganv2.models.fpn_inception", f"{base}/models/fpn_inception.py"
    )


def test_fpn_inception_parity():
    mod = load_reference_fpn_inception()
    oracle.seed_torch(0)
    norm_layer = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=True
    )
    ref = mod.FPNInception(norm_layer=norm_layer)
    ref.train(True)
    sd = {f"module.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    model = jfpn.FPNInception()
    params = jfpn.convert_state_dict(sd)

    x = (np.random.RandomState(1).rand(1, 160, 160, 3).astype(np.float32) - 0.5) * 2
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
