"""The demo's event handlers run without gradio installed (VERDICT r2
item 6): one restoration is driven through ``run_restoration`` end to end
(gray conversion, AWGN, engine tiling, output packing) with a tiny
injected model, and the dropdown/gallery handlers return sane payloads.
Mirrors the handler surface of /root/reference/scripts/demo.py:19-77,
160-165, 219-231.
"""

import os
import sys

import numpy as np
import pytest

from tpuir.core.engine import InferenceModel
from tpuir import demo_core


def _tiny_model(task, subtask, model_name, gray=False, sigma=None):
    assert task == "denoising" and subtask == "gaussian"
    ch = 1 if gray else 3
    return InferenceModel(
        name=f"tiny-{model_name}",
        apply_fn=lambda p, x: x * 0.5,
        params=None,
        patch_size=32,
        patch_overlap=8,
        batch_size=4,
    )


def test_run_restoration_color_with_noise():
    img = (np.random.RandomState(0).rand(70, 90, 3) * 255).astype(np.uint8)
    before, after, ms = demo_core.run_restoration(
        img, "Gaussian (Color, Non-blind)", "Restormer", 25, True, 32, 8,
        get_model=_tiny_model,
    )
    assert before.shape == (70, 90, 3) and after.shape == (70, 90, 3)
    assert before.dtype == np.uint8 and after.dtype == np.uint8
    # noise was added: the model input differs from the original
    assert not np.array_equal(before, img)
    # the tiny model halves intensities of the (noisy) input
    assert abs(after.mean() - before.mean() / 2) < 3.0
    assert ms.endswith(" ms")


def test_run_restoration_gray_converts_channels():
    img = (np.random.RandomState(1).rand(48, 52, 3) * 255).astype(np.uint8)
    before, after, _ = demo_core.run_restoration(
        img, "Gaussian (Gray, Non-blind)", "DnCNN", 15, False, 32, 8,
        get_model=_tiny_model,
    )
    assert before.ndim == 2 and after.ndim == 2  # squeezed HW1
    lum = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    assert np.array_equal(before, lum.round().astype(np.uint8))


def test_run_restoration_requires_image():
    with pytest.raises(ValueError):
        demo_core.run_restoration(
            None, "Gaussian (Color, Non-blind)", "Restormer", 25, False, 32, 8,
            get_model=_tiny_model,
        )


def test_subtask_change_payloads():
    models, sigma_vis, ps, po, samples = demo_core.subtask_change(
        "Gaussian (Color, Non-blind)"
    )
    assert models == ["Restormer", "MaIR"]
    assert sigma_vis is True
    assert (ps, po) == (256, 48)  # Restormer denoise patch config
    assert isinstance(samples, list)

    models, sigma_vis, *_ = demo_core.subtask_change("Gaussian (Gray, Blind)")
    assert models == ["DnCNN", "Restormer"] and sigma_vis is False

    models, *_ = demo_core.subtask_change("Motion")
    assert models == ["DeblurGANv2 (Inception)", "DeblurGANv2 (MobileNet)",
                      "Restormer", "MaIR"]

    with pytest.raises(ValueError):
        demo_core.subtask_change("Nonexistent Subtask")


def test_gallery_select_loads_indexed_sample(tmp_path):
    cv2 = pytest.importorskip("cv2")
    p = tmp_path / "s.png"
    want = (np.random.RandomState(2).rand(10, 12, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(p), want[..., ::-1])  # imwrite takes BGR
    got = demo_core.gallery_select(["other", str(p)], 1)
    assert np.array_equal(got, want)


def test_demo_script_importable_without_gradio(monkeypatch):
    """scripts/demo.py imports cleanly with gradio absent and reports the
    install hint from main()."""
    monkeypatch.setitem(sys.modules, "gradio", None)  # import returns None
    scripts = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    monkeypatch.syspath_prepend(scripts)
    import importlib

    demo = importlib.import_module("demo")
    assert demo.run_restoration is demo_core.run_restoration
