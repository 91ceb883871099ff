"""Synthesized-checkpoint CSV-row parity beyond DnCNN (VERDICT r4 item 4).

Same protocol as tests/test_csv_row_parity.py — a REAL checkpoint file at
the released shape/format goes through the actual production path (zoo
routing -> tiled engine with the family's pad/normalize hooks -> metrics
-> CSV row) and the row is recomputed with the reference pipeline restated
in torch/numpy — for the three families whose engine hooks DnCNN does not
exercise:

  * Restormer sigma15 color — ``{'params': sd}`` checkpoint, reflect
    pad-to-x8 (/root/reference/src/utils.py:174-181), BiasFree LayerNorm
    (src/restormer/options/GaussianColorDenoising_RestormerSigma15.yml).
  * MaIR-CDN s15 — ``{'params': sd}`` checkpoint incl. scan-id buffers,
    same pad-to-x8 hook, full released config (embed_dim 180, (6,)x6).
  * DeblurGANv2-MobileNet — ``{'model': DataParallel-prefixed sd}``
    .h5 torch file (src/deblurganv2/predictor naming), [-1,1] normalize +
    always-pad-to-32 + (x+1)/2 postprocess
    (/root/reference/src/deblurganv2/__init__.py:11-41).

Reference CSV machinery: /root/reference/scripts/tests.py:25-80,
engine /root/reference/src/utils.py:270-311,353-454.
"""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from tests import oracle
from tests.test_engine_e2e import _torch_engine_loop
from tpuir.core.image_io import normalize_signed
from tpuir.core.metrics import calculate_metrics
from tpuir.harness import Harness


def _torch_pad8(t):
    hp, wp = t.shape[-2:]
    H = ((hp + 8) // 8) * 8
    W = ((wp + 8) // 8) * 8
    return torch.nn.functional.pad(
        t, (0, (W - wp) if wp % 8 else 0, 0, (H - hp) if hp % 8 else 0),
        "reflect",
    )


def _write_dataset(root, rel, shapes, channels, rng_seed=3):
    ds = root / rel
    ds.mkdir(parents=True)
    rng = np.random.RandomState(rng_seed)
    paths = []
    for i, (h, w) in enumerate(shapes):
        img = (rng.rand(h, w, channels).squeeze() * 255).astype(np.uint8)
        p = ds / f"{i + 1:02d}.png"
        cv2.imwrite(str(p), img)
        paths.append(p)
    return paths


def _row_vs_reference(row, ref_module, env, *, rel_paths, ps, ov, normalize,
                      pad_fn, postprocess, noise_sigma, targets=None):
    psnrs, ssims = [], []
    for i, rel in enumerate(rel_paths):
        img = cv2.imread(str(env / rel), cv2.IMREAD_UNCHANGED)
        if img.ndim == 2:
            img = img[:, :, None]
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        pred = _torch_engine_loop(
            ref_module, img, ps, ov, normalize=normalize, pad_fn=pad_fn,
            postprocess=postprocess, noise_sigma=noise_sigma,
        )
        tgt = img
        if targets is not None:
            tgt = cv2.imread(str(env / targets[i]), cv2.IMREAD_UNCHANGED)
            tgt = cv2.cvtColor(tgt, cv2.COLOR_BGR2RGB)
        p, s = calculate_metrics(pred, tgt)
        psnrs.append(p)
        ssims.append(s)
    want_psnr, want_ssim = float(np.mean(psnrs)), float(np.mean(ssims))
    assert abs(row["PSNR"] - want_psnr) <= 0.05, (row["PSNR"], want_psnr)
    assert abs(row["PSNR"] - want_psnr) <= 5e-3, (row["PSNR"], want_psnr)
    assert abs(row["SSIM"] - want_ssim) <= 1e-3, (row["SSIM"], want_ssim)


def test_restormer_sigma15_color_csv_row(tmp_path, monkeypatch):
    oracle.add_reference_path()
    from restormer.restormer import Restormer as TR

    oracle.seed_torch(0)
    ref = TR(
        inp_channels=3, out_channels=3, dim=48, num_blocks=[4, 6, 6, 8],
        num_refinement_blocks=4, heads=[1, 2, 4, 8], ffn_expansion_factor=2.66,
        bias=False, LayerNorm_type="BiasFree", dual_pixel_task=False,
    ).eval()

    wd = tmp_path / "weights" / "Restormer" / "denoising"
    wd.mkdir(parents=True)
    torch.save({"params": ref.state_dict()},
               wd / "gaussian_color_denoising_sigma15.pth")
    _write_dataset(tmp_path, "datasets/denoising/gaussian/test/CBSD68",
                   [(48, 52)], 3)
    monkeypatch.setenv("TPUIR_DATASET_DIR", str(tmp_path / "datasets"))

    h = Harness(weights_dir=str(tmp_path / "weights"),
                results_dir=str(tmp_path / "results"), save_images=False)
    h.gaussian_color_nonblind(datasets=("CBSD68",), sigmas=(15,),
                              models=("Restormer",))
    assert len(h.results_table) == 1
    row = h.results_table[0]
    assert row["Model"] == "Restormer"
    # released Restormer color param count (matches the torch module)
    assert row["Model_Params"] == sum(p.numel() for p in ref.parameters())

    # reference pipeline: Restormer patch 256/48 (src/configs.py), images
    # smaller than the patch collapse to one tile; reflect pad to x8
    _row_vs_reference(
        row, ref, tmp_path,
        rel_paths=["datasets/denoising/gaussian/test/CBSD68/01.png"],
        ps=256, ov=48, normalize=lambda x: x.astype(np.float32) / 255.0,
        pad_fn=_torch_pad8, postprocess=None, noise_sigma=15,
    )


def test_mair_cdn_s15_csv_row(tmp_path, monkeypatch):
    arch = oracle.load_reference_mair_arch()
    oracle.seed_torch(0)
    # img_size must match the engine's effective patch (square images below,
    # x8-divisible, so no pad occurs in either path): the reference module
    # builds its scan-id buffers for this size (dynamic_ids=False = the
    # released checkpoint layout, id buffers included in the state_dict).
    ref = arch.MaIR(
        img_size=48, in_chans=3, embed_dim=180, depths=(6,) * 6, d_state=16,
        ssm_ratio=1.3, mlp_ratio=2.0, scan_len=4, img_range=1.0,
        upsampler=None, resi_connection="1conv", dynamic_ids=False,
        drop_path_rate=0.0,
    ).eval()

    wd = tmp_path / "weights" / "MaIR" / "denoising"
    wd.mkdir(parents=True)
    torch.save({"params": ref.state_dict()}, wd / "MaIR_CDN_s15.pth")
    _write_dataset(tmp_path, "datasets/denoising/gaussian/test/CBSD68",
                   [(48, 48)], 3)
    monkeypatch.setenv("TPUIR_DATASET_DIR", str(tmp_path / "datasets"))

    h = Harness(weights_dir=str(tmp_path / "weights"),
                results_dir=str(tmp_path / "results"), save_images=False)
    h.gaussian_color_nonblind(datasets=("CBSD68",), sigmas=(15,),
                              models=("MaIR",))
    assert len(h.results_table) == 1
    row = h.results_table[0]
    assert row["Model"] == "MaIR"

    _row_vs_reference(
        row, ref, tmp_path,
        rel_paths=["datasets/denoising/gaussian/test/CBSD68/01.png"],
        ps=128, ov=32, normalize=lambda x: x.astype(np.float32) / 255.0,
        pad_fn=_torch_pad8, postprocess=None, noise_sigma=15,
    )


def test_deblurgan_mobilenet_csv_row(tmp_path, monkeypatch):
    from tests.test_fpn_mobilenet import load_reference_fpn_mobilenet

    mod = load_reference_fpn_mobilenet()
    oracle.seed_torch(0)
    nl = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=True
    )
    ref = mod.FPNMobileNet(norm_layer=nl, pretrained=False).train(True)

    wd = tmp_path / "weights" / "DeblurGANv2"
    wd.mkdir(parents=True)
    torch.save(
        {"model": {f"module.{k}": v for k, v in ref.state_dict().items()}},
        wd / "fpn_mobilenet.h5",
    )
    rng = np.random.RandomState(5)
    ds = tmp_path / "datasets/deblurring/motion/test/GoPro"
    (ds / "input").mkdir(parents=True)
    (ds / "target").mkdir(parents=True)
    blur = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
    sharp = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(ds / "input" / "01.png"), blur)
    cv2.imwrite(str(ds / "target" / "01.png"), sharp)
    monkeypatch.setenv("TPUIR_DATASET_DIR", str(tmp_path / "datasets"))

    h = Harness(weights_dir=str(tmp_path / "weights"),
                results_dir=str(tmp_path / "results"), save_images=False)
    h.motion_blur(datasets=("GoPro",), models=("DeblurGANv2 (MobileNet)",))
    assert len(h.results_table) == 1
    row = h.results_table[0]
    assert row["Model"] == "DeblurGANv2 (MobileNet)"

    def torch_pad32(t):
        hp, wp = t.shape[-2:]
        H = (hp // 32 + 1) * 32
        W = (wp // 32 + 1) * 32
        return torch.nn.functional.pad(t, (0, W - wp, 0, H - hp))

    _row_vs_reference(
        row, ref, tmp_path,
        rel_paths=["datasets/deblurring/motion/test/GoPro/input/01.png"],
        targets=["datasets/deblurring/motion/test/GoPro/target/01.png"],
        ps=None, ov=0, normalize=normalize_signed, pad_fn=torch_pad32,
        postprocess=lambda y: (y + 1) / 2.0, noise_sigma=None,
    )
