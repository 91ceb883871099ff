"""End-to-end engine runs vs a restated reference per-patch torch loop,
with real (small-config) models — the regression version of the manual
verification drives."""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tpuir.core.engine import InferenceModel, run_model_inference
from tpuir.core.image_io import normalize_signed
from tpuir.core.tiling import gaussian_window, tile_indices


def _torch_engine_loop(ref, img, ps, ov, *, normalize, pad_fn, postprocess,
                       noise_sigma=None):
    imgn = normalize(img)
    h, w = imgn.shape[:2]
    eff, his, wis = tile_indices(h, w, ps, ov)
    n_out = 3 if imgn.shape[2] >= 3 else 1
    out = np.zeros((h, w, n_out), np.float32)
    wmap = np.zeros_like(out)
    win = gaussian_window(eff, eff, n_out)
    with torch.no_grad():
        for hi in his:
            for wi in wis:
                p = imgn[hi : hi + eff, wi : wi + eff, :].copy()
                if noise_sigma is not None:
                    np.random.seed(0)
                    p += np.random.normal(0, noise_sigma / 255.0, p.shape)
                    p = np.clip(p, 0, 1).astype(np.float32)
                t = torch.from_numpy(p.transpose(2, 0, 1)).unsqueeze(0)
                hp, wp = t.shape[-2:]
                if pad_fn is not None:
                    t = pad_fn(t)
                y = ref(t)[:, :, :hp, :wp]
                if postprocess is not None:
                    y = postprocess(y)
                y = y.numpy()[0].transpose(1, 2, 0)
                ch, cw = y.shape[:2]
                out[hi : hi + ch, wi : wi + cw] += y * win[:ch, :cw]
                wmap[hi : hi + ch, wi : wi + cw] += win[:ch, :cw]
    out /= np.maximum(wmap, 1e-8)
    return np.clip(out * 255.0, 0, 255).round().astype(np.uint8)


def test_restormer_engine_e2e():
    oracle.add_reference_path()
    from restormer.restormer import Restormer as TR

    from tpuir.models import restormer as jres

    oracle.seed_torch(0)
    kw = dict(inp_channels=3, out_channels=3, dim=16, num_blocks=[1, 1, 1, 1],
              num_refinement_blocks=1, heads=[1, 2, 4, 8],
              ffn_expansion_factor=2.66, bias=False, LayerNorm_type="BiasFree",
              dual_pixel_task=False)
    ref = TR(**kw).eval()
    sd = oracle.state_dict_numpy(ref)
    model = InferenceModel(
        name="Restormer",
        apply_fn=jres.Restormer(dim=16, num_blocks=(1, 1, 1, 1),
                                num_refinement_blocks=1,
                                layer_norm_bias=False).apply,
        params=jres.convert_state_dict(sd, (1, 1, 1, 1), 1, False, False),
        patch_size=56, patch_overlap=16, pad_factor=8, batch_size=3,
    )
    img = (np.random.RandomState(1).rand(80, 96, 3) * 255).astype(np.uint8)
    got, _ = run_model_inference(model, img, need_degradation=True, noise_level=15)

    def torch_pad(t):
        hp, wp = t.shape[-2:]
        H = ((hp + 8) // 8) * 8
        W = ((wp + 8) // 8) * 8
        return torch.nn.functional.pad(
            t, (0, (W - wp) if wp % 8 else 0, 0, (H - hp) if hp % 8 else 0),
            "reflect",
        )

    want = _torch_engine_loop(
        ref, img, 56, 16, normalize=lambda x: x.astype(np.float32) / 255.0,
        pad_fn=torch_pad, postprocess=None, noise_sigma=15,
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


def test_deblurgan_mobilenet_engine_e2e():
    from tests.test_fpn_mobilenet import load_reference_fpn_mobilenet
    from tpuir.models.deblurgan import fpn_mobilenet as jf

    mod = load_reference_fpn_mobilenet()
    oracle.seed_torch(0)
    nl = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=True
    )
    ref = mod.FPNMobileNet(norm_layer=nl, pretrained=False).train(True)
    sd = {f"module.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    model = InferenceModel(
        name="DeblurGANv2 (MobileNet)", apply_fn=jf.FPNMobileNet().apply,
        params=jf.convert_state_dict(sd), patch_size=None, patch_overlap=0,
        pad_block=32, normalize=normalize_signed,
        postprocess=lambda x: (x + 1) / 2.0, batch_size=1,
    )
    img = (np.random.RandomState(2).rand(80, 100, 3) * 255).astype(np.uint8)
    got, _ = run_model_inference(model, img)

    def torch_pad(t):
        hp, wp = t.shape[-2:]
        H = (hp // 32 + 1) * 32
        W = (wp // 32 + 1) * 32
        return torch.nn.functional.pad(t, (0, W - wp, 0, H - hp))

    want = _torch_engine_loop(
        ref, img, None, 0, normalize=normalize_signed, pad_fn=torch_pad,
        postprocess=lambda y: (y + 1) / 2.0,
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.02
