"""Released-config oracle parity (VERDICT r1 item 4).

Round-1 parity tests used toy configs; a converter or layout bug that only
manifests at the released sizes (Restormer dim 48 / blocks 4,6,6,8 / heads
1,2,4,8; MaIR dim 180 / depths (6,)x6 / d_state 16 / ratio 1.3; MaIRUNet
dim 48 / ratio 2.0) would sail through. These tests push random weights at
the FULL released configs through the converters at 64x64 and compare
against the reference PyTorch modules (CPU, sequential-scan stand-in for
the CUDA kernel).

Reference configs: /root/reference/src/restormer/restormer.py:193-284,
/root/reference/src/mair/basicsr/archs/mair_arch.py:493-790,
/root/reference/src/mair/realDenoising/basicsr/models/archs/mairunet_arch.py:445-739,
option files src/mair/options/test_MaIR_CDN_s15.yml:55-70 and
src/mair/realDenoising/options/test_MaIR_RealDN.yml:17-34.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle


@pytest.mark.parametrize("ln_type", ["BiasFree", "WithBias"])
def test_restormer_released_config_parity(ln_type):
    oracle.add_reference_path()
    from restormer.restormer import Restormer as TR

    from tpuir.models import restormer as jres

    oracle.seed_torch(0)
    kw = dict(
        inp_channels=3, out_channels=3, dim=48, num_blocks=[4, 6, 6, 8],
        num_refinement_blocks=4, heads=[1, 2, 4, 8],
        ffn_expansion_factor=2.66, bias=False, LayerNorm_type=ln_type,
        dual_pixel_task=False,
    )
    ref = TR(**kw).eval()
    sd = oracle.state_dict_numpy(ref)

    ln_bias = ln_type == "WithBias"
    model = jres.Restormer(layer_norm_bias=ln_bias)
    params = jres.convert_state_dict(sd, (4, 6, 6, 8), 4, False, ln_bias)

    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_mair_released_cdn_config_parity():
    """MaIR_CDN: embed_dim 180, depths (6,)x6, d_state 16, ssm_ratio 1.3."""
    arch = oracle.load_reference_mair_arch()
    oracle.seed_torch(0)
    kw = dict(
        img_size=64, in_chans=3, embed_dim=180, depths=(6, 6, 6, 6, 6, 6),
        d_state=16, ssm_ratio=1.3, mlp_ratio=2.0, scan_len=4, img_range=1.0,
        upsampler=None, resi_connection="1conv", dynamic_ids=False,
        drop_path_rate=0.0,
    )
    ref = arch.MaIR(**kw).eval()
    sd = oracle.state_dict_numpy(ref)

    from tpuir.models import mair as jmair

    model = jmair.MaIR(
        in_chans=3, embed_dim=180, depths=(6, 6, 6, 6, 6, 6), d_state=16,
        ssm_ratio=1.3, mlp_ratio=2.0, scan_len=4, scan_chunk=256,
    )
    params = jmair.convert_state_dict(
        sd, depths=(6, 6, 6, 6, 6, 6), embed_dim=180, ssm_ratio=1.3
    )

    x = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_mairunet_released_config_parity():
    """MaIR_RealDN: dim 48, blocks 4/6/6/8, ssm_ratio 2.0, flp 4.0, mlp 1.5."""
    arch = oracle.load_reference_mairunet_arch()
    oracle.seed_torch(0)
    # Reference CPU-eval path crashes (ids only set when CUDA is available,
    # mairunet_arch.py:657-673); train mode uses the cached-id path and is
    # numerically identical here (all dropout rates are 0).
    ref = arch.MaIRUNet(
        inp_channels=3, out_channels=3, dim=48, num_blocks=[4, 6, 6, 8],
        num_refinement_blocks=4, ssm_ratio=2.0, flp_ratio=4.0, mlp_ratio=1.5,
        bias=False, dual_pixel_task=False, scan_len=4, img_size=64,
    ).train()
    sd = oracle.state_dict_numpy(ref)

    from tpuir.models import mair_unet as ju

    model = ju.MaIRUNet(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        ssm_ratio=2.0, flp_ratio=4.0, mlp_ratio=1.5,
    )
    params = ju.convert_state_dict(
        sd, dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        ssm_ratio=2.0,
    )

    x = np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32)
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
