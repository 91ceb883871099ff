"""Parity: DnCNN / REDNet Flax models vs the PyTorch reference with
identical (randomly initialized, converted) weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tpuir.models import dncnn as jdncnn
from tpuir.models import rednet as jrednet


@pytest.mark.parametrize("in_nc,nb", [(1, 17), (1, 20), (3, 20)])
def test_dncnn_parity(in_nc, nb):
    oracle.add_reference_path()
    from dncnn.models.network_dncnn import DnCNN as TorchDnCNN

    oracle.seed_torch(0)
    ref = TorchDnCNN(in_nc=in_nc, out_nc=in_nc, nc=64, nb=nb, act_mode="R").eval()
    sd = oracle.state_dict_numpy(ref)

    model = jdncnn.DnCNN(in_nc=in_nc, out_nc=in_nc, nc=64, nb=nb)
    params = jdncnn.convert_state_dict(sd, nb)

    x = np.random.RandomState(1).rand(2, 24, 28, in_nc).astype(np.float32)
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_rednet_parity():
    oracle.add_reference_path()
    from rednet.rednet import REDNet as TorchREDNet

    oracle.seed_torch(0)
    ref = TorchREDNet(num_channels=1, num_features=32).eval()
    sd = oracle.state_dict_numpy(ref)

    model = jrednet.REDNet(num_channels=1, num_features=32)
    params = jrednet.convert_state_dict(sd)

    x = np.random.RandomState(2).rand(1, 40, 36, 1).astype(np.float32)
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_deconv_equivalence_single_layer():
    """stride-1 ConvTranspose2d == correlation with flipped/swapped kernel."""
    oracle.seed_torch(3)
    deconv = torch.nn.ConvTranspose2d(5, 7, 3, stride=1, padding=1).eval()
    w = deconv.weight.detach().numpy()
    b = deconv.bias.detach().numpy()

    import flax.linen as nn

    conv = nn.Conv(7, (3, 3), padding=1)
    params = {
        "params": {"kernel": jrednet._deconv_to_conv_hwio(w), "bias": b}
    }
    x = np.random.RandomState(4).rand(2, 9, 11, 5).astype(np.float32)
    got = np.asarray(conv.apply(params, x))
    want = oracle.torch_forward(deconv, x)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
