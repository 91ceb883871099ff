"""Zoo routing + checkpoint ingestion with synthetic weights files."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpuir import zoo
from tpuir.core.engine import run_model_inference


def _dncnn_sd(nc, nb):
    g = torch.Generator().manual_seed(0)
    sd = {}
    chans = [nc] + [64] * (nb - 1) + [nc]
    for i in range(nb):
        sd[f"model.{2*i}.weight"] = torch.randn(
            chans[i + 1], chans[i], 3, 3, generator=g
        ) * 0.05
        sd[f"model.{2*i}.bias"] = torch.randn(chans[i + 1], generator=g) * 0.01
    return sd


@pytest.fixture()
def weights_dir(tmp_path):
    d = tmp_path / "weights"
    (d / "DnCNN").mkdir(parents=True)
    torch.save(_dncnn_sd(1, 17), d / "DnCNN" / "dncnn_25.pth")
    torch.save(_dncnn_sd(3, 20), d / "DnCNN" / "dncnn_color_blind.pth")
    return str(d)


def test_dncnn_route_and_run(weights_dir):
    m = zoo.get_model_instance("denoising", "gaussian", "DnCNN", gray=True, sigma=25,
                               weights_dir=weights_dir)
    assert m.patch_size == 256 and m.patch_overlap == 48
    assert m.param_count > 0
    img = (np.random.RandomState(0).rand(40, 44, 1) * 255).astype(np.uint8)
    out, _ = run_model_inference(m, img, need_degradation=True, noise_level=25)
    assert out.shape == img.shape and out.dtype == np.uint8

    m3 = zoo.get_model_instance("denoising", "gaussian", "DnCNN", gray=False, sigma=None,
                                weights_dir=weights_dir)
    assert m3.name == "DnCNN"


def test_rednet_from_caffemodel(tmp_path):
    from tests.test_caffe import _len_field, _blob_new

    d = tmp_path / "weights" / "REDNet"
    d.mkdir(parents=True)
    g = np.random.RandomState(0)
    layers = b""
    for i in range(1, 16):
        w = (g.randn(128, 1 if i == 1 else 128, 3, 3) * 0.02).astype(np.float32)
        b = np.zeros(128, np.float32)
        layers += _len_field(
            100,
            _len_field(1, f"conv{i}".encode())
            + _len_field(7, _blob_new(w))
            + _len_field(7, _blob_new(b)),
        )
    for i in range(1, 16):
        out_c = 1 if i == 15 else 128
        w = (g.randn(128, out_c, 3, 3) * 0.02).astype(np.float32)  # (in,out,kh,kw)
        b = np.zeros(out_c, np.float32)
        layers += _len_field(
            100,
            _len_field(1, f"deconv{i}".encode())
            + _len_field(7, _blob_new(w))
            + _len_field(7, _blob_new(b)),
        )
    (d / "50.caffemodel").write_bytes(layers)

    m = zoo.get_model_instance(
        "denoising", "gaussian", "REDNet", gray=True, sigma=50,
        weights_dir=str(tmp_path / "weights"),
    )
    assert m.patch_size == 128
    img = (np.random.RandomState(1).rand(36, 36, 1) * 255).astype(np.uint8)
    out, _ = run_model_inference(m, img)
    assert out.shape == img.shape


def test_unsupported_config_raises(weights_dir):
    with pytest.raises(ValueError):
        zoo.get_model_instance("denoising", "gaussian", "DnCNN", gray=False, sigma=25,
                               weights_dir=weights_dir)
    with pytest.raises(ValueError):
        zoo.get_model_instance("deblurring", "motion", "DnCNN", weights_dir=weights_dir)


def test_missing_weights_filenotfound(tmp_path):
    with pytest.raises(FileNotFoundError):
        zoo.get_model_instance(
            "denoising", "gaussian", "DnCNN", gray=True, sigma=25,
            weights_dir=str(tmp_path),
        )


def test_deblurgan_serving_precision_routes_phase_path(tmp_path):
    """zoo precision='serving' builds the phase-packed MobileNet engine
    bundle (phase_io pack4) and its output matches the parity path."""
    import functools

    from tests import oracle
    from tests.test_fpn_mobilenet import load_reference_fpn_mobilenet

    mod = load_reference_fpn_mobilenet()
    oracle.seed_torch(0)
    nl = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=True
    )
    ref = mod.FPNMobileNet(norm_layer=nl, pretrained=False).train(True)
    d = tmp_path / "weights" / "DeblurGANv2"
    d.mkdir(parents=True)
    torch.save(
        {"model": {f"module.{k}": v for k, v in ref.state_dict().items()}},
        d / "fpn_mobilenet.h5",
    )
    wd = str(tmp_path / "weights")
    par = zoo.get_model_instance("deblurring", "motion", "DeblurGANv2 (MobileNet)",
                                 weights_dir=wd, precision="parity")
    srv = zoo.get_model_instance("deblurring", "motion", "DeblurGANv2 (MobileNet)",
                                 weights_dir=wd, precision="serving")
    assert not par.phase_io and srv.phase_io and srv.phase_factor == 4
    img = (np.random.RandomState(7).rand(45, 53, 3) * 255).astype(np.uint8)
    out_p, _ = run_model_inference(par, img)
    out_s, _ = run_model_inference(srv, img)
    diff = np.abs(out_p.astype(int) - out_s.astype(int))
    assert diff.max() <= 1, diff.max()
