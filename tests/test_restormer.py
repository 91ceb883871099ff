"""Parity: Restormer Flax model vs the PyTorch reference (converted weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tpuir.models import restormer as jres
from tpuir.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


def test_pixel_shuffle_matches_torch():
    x = np.random.RandomState(0).rand(2, 8, 6, 12).astype(np.float32)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want_un = torch.nn.PixelUnshuffle(2)(t).numpy().transpose(0, 2, 3, 1)
    got_un = np.asarray(pixel_unshuffle(x, 2))
    np.testing.assert_array_equal(got_un, want_un)

    want_sh = torch.nn.PixelShuffle(2)(t).numpy().transpose(0, 2, 3, 1)
    got_sh = np.asarray(pixel_shuffle(x, 2))
    np.testing.assert_array_equal(got_sh, want_sh)


@pytest.mark.parametrize(
    "ln_type,in_ch,dual",
    [("BiasFree", 3, False), ("WithBias", 3, False), ("WithBias", 6, True), ("BiasFree", 1, False)],
)
def test_restormer_parity(ln_type, in_ch, dual):
    oracle.add_reference_path()
    from restormer.restormer import Restormer as TorchRestormer

    kw = dict(
        inp_channels=in_ch,
        out_channels=3 if dual else in_ch,
        dim=16,
        num_blocks=[1, 1, 1, 1],
        num_refinement_blocks=1,
        heads=[1, 2, 4, 8],
        ffn_expansion_factor=2.66,
        bias=False,
        LayerNorm_type=ln_type,
        dual_pixel_task=dual,
    )
    oracle.seed_torch(0)
    ref = TorchRestormer(**kw).eval()
    sd = oracle.state_dict_numpy(ref)

    model = jres.Restormer(
        inp_channels=in_ch,
        out_channels=3 if dual else in_ch,
        dim=16,
        num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1,
        heads=(1, 2, 4, 8),
        ffn_expansion_factor=2.66,
        bias=False,
        layer_norm_bias=(ln_type == "WithBias"),
        dual_pixel_task=dual,
    )
    params = jres.convert_state_dict(
        sd,
        num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1,
        bias=False,
        layer_norm_bias=(ln_type == "WithBias"),
        dual_pixel_task=dual,
    )

    x = np.random.RandomState(1).rand(1, 32, 24, in_ch).astype(np.float32)
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)
