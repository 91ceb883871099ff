"""One full CSV row on a synthesized released-shape checkpoint vs the
reference pipeline (VERDICT r3 item 6 fallback).

No released weights or datasets exist in this environment —
``python scripts/download.py weights`` fails with wget exit status 4
(zero network egress; recorded in docs/STATUS.md). The strongest
available evidence for the 0.05 dB CSV contract is therefore: write a
REAL checkpoint file at the released DnCNN shape (plain ``state_dict``
torch-zip, the exact format of KAIR's ``dncnn_25.pth``), run the actual
Harness suite on it (zoo routing -> tiled engine -> metrics -> CSV row),
and recompute the same row with the reference's own pipeline restated in
torch/numpy (per-patch loop with seeded AWGN, Gaussian-window blend,
uint8 restore, skimage metrics). Only the weight VALUES differ from the
released file; every byte of machinery in between is the tested path.

Reference: /root/reference/scripts/tests.py:25-80 (suite + CSV columns),
/root/reference/src/utils.py:353-454 (engine), :29-36 (seeded AWGN),
:134-156 (metrics); checkpoint format /root/reference/src/utils.py:229-236.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from tests import oracle
from tests.test_engine_e2e import _torch_engine_loop
from tpuir.core.image_io import normalize_image
from tpuir.core.metrics import calculate_metrics
from tpuir.harness import Harness


def _released_dncnn_sd():
    """Random weights at the RELEASED dncnn_25 shape: gray, 17 layers,
    64 channels, act 'R' (src/utils.py:232: DnCNN(1, 1, 64, 17))."""
    g = torch.Generator().manual_seed(7)
    sd = {}
    chans = [1] + [64] * 16 + [1]
    for i in range(17):
        sd[f"model.{2 * i}.weight"] = (
            torch.randn(chans[i + 1], chans[i], 3, 3, generator=g) * 0.05
        )
        sd[f"model.{2 * i}.bias"] = torch.randn(chans[i + 1], generator=g) * 0.01
    return sd


@pytest.fixture()
def env(tmp_path, monkeypatch):
    ds = tmp_path / "datasets" / "denoising" / "gaussian" / "test" / "Set12"
    ds.mkdir(parents=True)
    rng = np.random.RandomState(3)
    shapes = [(48, 52), (40, 40)]
    for i, (h, w) in enumerate(shapes):
        img = (rng.rand(h, w) * 255).astype(np.uint8)
        cv2.imwrite(str(ds / f"{i + 1:02d}.png"), img)
    wd = tmp_path / "weights" / "DnCNN"
    wd.mkdir(parents=True)
    torch.save(_released_dncnn_sd(), wd / "dncnn_25.pth")
    monkeypatch.setenv("TPUIR_DATASET_DIR", str(tmp_path / "datasets"))
    return tmp_path


def test_dncnn_sigma25_csv_row_matches_reference_pipeline(env):
    # --- the framework's row: checkpoint file -> zoo -> engine -> CSV ---
    h = Harness(
        weights_dir=str(env / "weights"),
        results_dir=str(env / "results"),
        save_images=False,
    )
    h.gaussian_gray_nonblind(
        datasets=("Set12",), sigmas=(25,), models=("DnCNN",)
    )
    assert len(h.results_table) == 1
    row = h.results_table[0]
    assert row["Model"] == "DnCNN"
    assert row["Model_Params"] == 555_137  # released dncnn_25 param count

    # --- the reference pipeline on the same checkpoint file ---
    oracle.add_reference_path()
    from dncnn.models.network_dncnn import DnCNN as TorchDnCNN

    ref = TorchDnCNN(in_nc=1, out_nc=1, nc=64, nb=17, act_mode="R")
    ref.load_state_dict(torch.load(str(env / "weights/DnCNN/dncnn_25.pth")))
    ref.eval()

    psnrs, ssims = [], []
    for name in ("01.png", "02.png"):
        img = cv2.imread(
            str(env / "datasets/denoising/gaussian/test/Set12" / name),
            cv2.IMREAD_UNCHANGED,
        )[:, :, None]
        # reference engine semantics: patch config DnCNN 256/48
        # (src/configs.py:13-16), images smaller than the patch collapse
        # to a single tile
        pred = _torch_engine_loop(
            ref, img, 256, 48,
            normalize=normalize_image, pad_fn=None, postprocess=None,
            noise_sigma=25,
        )
        p, s = calculate_metrics(pred, img)
        psnrs.append(p)
        ssims.append(s)

    want_psnr = float(np.mean(psnrs))
    want_ssim = float(np.mean(ssims))
    # the CSV contract is <=0.05 dB; on identical weights the two paths
    # should agree to float noise
    assert abs(row["PSNR"] - want_psnr) <= 0.05, (row["PSNR"], want_psnr)
    assert abs(row["PSNR"] - want_psnr) <= 5e-3
    assert abs(row["SSIM"] - want_ssim) <= 1e-3
