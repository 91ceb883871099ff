"""End-to-end harness run on synthetic data + synthetic weights -> CSV."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from tests.test_zoo import _dncnn_sd
from tpuir.harness import Harness


@pytest.fixture()
def env(tmp_path, monkeypatch):
    # datasets/denoising/gaussian/test/Set12/*.png
    ds = tmp_path / "datasets" / "denoising" / "gaussian" / "test" / "Set12"
    ds.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        img = (rng.rand(40, 44) * 255).astype(np.uint8)
        cv2.imwrite(str(ds / f"{i+1:02d}.png"), img)

    wd = tmp_path / "weights" / "DnCNN"
    wd.mkdir(parents=True)
    torch.save(_dncnn_sd(1, 17), wd / "dncnn_25.pth")
    torch.save(_dncnn_sd(1, 20), wd / "dncnn_gray_blind.pth")

    monkeypatch.setenv("TPUIR_DATASET_DIR", str(tmp_path / "datasets"))
    return tmp_path


def test_harness_gray_suites_to_csv(env):
    h = Harness(
        weights_dir=str(env / "weights"),
        results_dir=str(env / "results"),
        save_images=True,
    )
    h.gaussian_gray_nonblind(datasets=("Set12",), sigmas=(25,), models=("REDNet", "DnCNN"))
    h.gaussian_gray_blind(datasets=("Set12",), sigmas=(25,), models=("DnCNN",))
    path = h.save_results()

    import pandas as pd

    df = pd.read_csv(path)
    # REDNet skipped (no weights); DnCNN nonblind + blind rows present.
    assert list(df.columns) == [
        "Task", "Type", "Dataset", "Sigma", "Model", "Model_Params", "PSNR",
        "SSIM", "Std_PSNR", "Std_SSIM", "Avg_Time_ms", "Std_Time_ms",
    ]
    assert len(df) == 2
    assert set(df["Type"]) == {"Gray Non-blind Gaussian Noise", "Gray Blind Gaussian Noise"}
    assert (df["Model"] == "DnCNN").all()
    assert df["PSNR"].notna().all()
    # result images were written
    out = env / "results" / "Gaussian_Denoising_Gray_Nonblind" / "Set12_Sig25" / "DnCNN"
    assert sorted(os.listdir(out)) == ["01.png", "02.png"]
