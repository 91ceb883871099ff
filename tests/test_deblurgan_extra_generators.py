"""Parity for the reference's config-selectable (untested-path) generators:
ResnetGenerator and FPNInceptionSimple."""

import functools
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tests.test_deblurgan_train import ref_networks  # noqa: F401 (fixture)
from tpuir.models.deblurgan import resnet_gen as jrg


def _inorm():
    return functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=True
    )


@pytest.mark.parametrize("n_blocks,learn_residual", [(2, True), (3, False)])
def test_resnet_generator_parity(ref_networks, n_blocks, learn_residual):  # noqa: F811
    oracle.seed_torch(n_blocks)
    ref = ref_networks.ResnetGenerator(
        norm_layer=_inorm(), use_dropout=False, n_blocks=n_blocks,
        learn_residual=learn_residual,
    )
    ref.train(True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = jrg.ResnetGenerator(n_blocks=n_blocks, learn_residual=learn_residual)
    params = jrg.convert_state_dict(sd, n_blocks=n_blocks)
    x = (np.random.RandomState(5).rand(1, 64, 64, 3).astype(np.float32) - 0.5) * 2
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def load_reference_fpn_inception_simple():
    from tests.inception_torch import fake_timm_module

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
    # the discriminator fixture may have stubbed this module; evict it
    sys.modules.pop("deblurganv2.models.fpn_inception_simple", None)
    return oracle._load_by_path(
        "deblurganv2.models.fpn_inception_simple",
        f"{base}/models/fpn_inception_simple.py",
    )


def load_reference_unet_seresnext():
    import types

    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    base = "/root/reference/src/deblurganv2"
    oracle._ensure_pkg("deblurganv2", base)
    oracle._ensure_pkg("deblurganv2.models", f"{base}/models")
    senet = oracle._load_by_path(
        "deblurganv2.models.senet", f"{base}/models/senet.py"
    )
    sys.modules["deblurganv2.models"].senet = senet
    sys.modules.pop("deblurganv2.models.unet_seresnext", None)
    return oracle._load_by_path(
        "deblurganv2.models.unet_seresnext", f"{base}/models/unet_seresnext.py"
    )


def test_unet_seresnext_parity():
    from tpuir.models.deblurgan.unet_seresnext import (
        UNetSEResNext,
        convert_state_dict,
    )

    mod = load_reference_unet_seresnext()
    oracle.seed_torch(1)
    ref = mod.UNetSEResNext(pretrained=False, is_deconv=True)
    ref.train(True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = UNetSEResNext()
    params = convert_state_dict(sd)
    x = (np.random.RandomState(6).rand(1, 64, 64, 3).astype(np.float32) - 0.5) * 2
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def load_reference_fpn_densenet():
    import types

    import tests.densenet_torch as dnt

    tvm = types.ModuleType("torchvision.models")
    tvm.densenet121 = dnt.densenet121
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    base = "/root/reference/src/deblurganv2"
    oracle._ensure_pkg("deblurganv2", base)
    oracle._ensure_pkg("deblurganv2.models", f"{base}/models")
    sys.modules.pop("deblurganv2.models.fpn_densenet", None)
    return oracle._load_by_path(
        "deblurganv2.models.fpn_densenet", f"{base}/models/fpn_densenet.py"
    )


def test_fpn_densenet_parity():
    from tpuir.models.deblurgan.fpn_densenet import FPNDense, convert_state_dict

    mod = load_reference_fpn_densenet()
    oracle.seed_torch(2)
    ref = mod.FPNDense(pretrained=False)
    ref.train(True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = FPNDense()
    params = convert_state_dict(sd)
    x = (np.random.RandomState(4).rand(1, 64, 64, 3).astype(np.float32) - 0.5) * 2
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_fpn_inception_simple_parity():
    from tpuir.models.deblurgan.fpn_inception_simple import (
        FPNInceptionSimple,
        convert_state_dict,
    )

    mod = load_reference_fpn_inception_simple()
    oracle.seed_torch(0)
    ref = mod.FPNInceptionSimple(norm_layer=_inorm())
    ref.train(True)
    sd = {f"module.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    model = FPNInceptionSimple()
    params = convert_state_dict(sd)
    x = (np.random.RandomState(2).rand(1, 160, 160, 3).astype(np.float32) - 0.5) * 2
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
