#!/usr/bin/env python
"""Gradio web demo — interactive restoration against the TPU backend.

Functional redesign of the reference scripts/demo.py: task/subtask
dropdowns, a model-availability matrix (gray/blind/sigma filtering mirrors
demo.py:44-77), dataset sample gallery, optional AWGN degradation, patch
size/overlap sliders, and a before/after image comparison.

Requires ``pip install gradio``; prints instructions when unavailable.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from glob import glob

import numpy as np

from tpuir import zoo
from tpuir.config import ROOT_DATASET_DIR, get_patch_config
from tpuir.core.degrade import add_gaussian_noise
from tpuir.core.engine import run_model_inference
from tpuir.core.image_io import imread_uint8
from tpuir.core.metrics import calculate_metrics
from tpuir.utils.natsort import natsorted

TASKS = {
    "Denoising": {
        "Gaussian (Gray, Non-blind)": ("denoising", "gaussian", True, [15, 25, 50]),
        "Gaussian (Gray, Blind)": ("denoising", "gaussian", True, None),
        "Gaussian (Color, Non-blind)": ("denoising", "gaussian", False, [15, 25, 50]),
        "Gaussian (Color, Blind)": ("denoising", "gaussian", False, None),
        "Real Noise": ("denoising", "real", False, None),
    },
    "Deblurring": {
        "Defocus": ("deblurring", "defocus", False, None),
        "Motion": ("deblurring", "motion", False, None),
    },
}

SUBTASK_DATASET_DIRS = {
    ("denoising", "gaussian"): os.path.join("denoising", "gaussian", "test"),
    ("deblurring", "defocus"): os.path.join("deblurring", "defocus", "test"),
    ("deblurring", "motion"): os.path.join("deblurring", "motion", "test"),
}


def available_models(task, subtask, gray, blind):
    """Model-availability matrix (mirrors reference demo.py:44-77)."""
    if task == "denoising" and subtask == "gaussian":
        if gray:
            return ["DnCNN", "Restormer"] if blind else ["REDNet", "DnCNN", "Restormer"]
        return ["DnCNN", "Restormer"] if blind else ["Restormer", "MaIR"]
    if task == "denoising" and subtask == "real":
        return ["Restormer", "MaIR"]
    if task == "deblurring" and subtask == "defocus":
        return ["Restormer", "Restormer (Dual-pixel)"]
    if task == "deblurring" and subtask == "motion":
        return ["DeblurGANv2 (Inception)", "DeblurGANv2 (MobileNet)", "Restormer", "MaIR"]
    return []


def sample_images(task, subtask, max_n=12):
    rel = SUBTASK_DATASET_DIRS.get((task, subtask))
    if rel is None:
        return []
    root = os.path.join(os.environ.get("TPUIR_DATASET_DIR", ROOT_DATASET_DIR), rel)
    files = []
    for ds in sorted(glob(os.path.join(root, "*"))):
        sub = os.path.join(ds, "input") if os.path.isdir(os.path.join(ds, "input")) else ds
        files += natsorted(glob(os.path.join(sub, "*.*")))[:3]
    return files[:max_n]


def device_choices():
    """Backend devices offered by the selector (reference demo.py:352-355
    offers cuda/cpu; here every JAX device plus the host CPU)."""
    import jax

    names = [f"{d.platform}:{d.id}" for d in jax.devices()]
    if not any(n.startswith("cpu") for n in names):
        names.append("cpu:0")
    return names


def _resolve_device(name):
    import jax

    platform, _, idx = name.partition(":")
    for d in jax.devices(platform):
        if d.id == int(idx or 0):
            return d
    return jax.devices()[0]


def run_restoration(image, subtask_label, model_name, sigma, add_noise,
                    patch_size, patch_overlap, device_name=None, progress=None):
    import jax

    task, subtask, gray, sigmas = None, None, False, None
    for t, subs in TASKS.items():
        if subtask_label in subs:
            task, subtask, gray, sigmas = subs[subtask_label]
    if image is None:
        raise ValueError("upload or pick an image first")
    img = np.asarray(image)
    if gray and img.ndim == 3:
        img = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        img = img.round().astype(np.uint8)[:, :, None]
    blind = "Blind" in subtask_label
    model = zoo.get_model_instance(
        task, subtask, model_name, gray=gray,
        sigma=None if blind or sigmas is None else sigma,
    )
    if add_noise and subtask == "gaussian":
        img = (add_gaussian_noise(img, sigma) * 255).round().astype(np.uint8)
    dev_ctx = (
        jax.default_device(_resolve_device(device_name))
        if device_name else _nullcontext()
    )
    with dev_ctx:
        pred, ms = run_model_inference(
            model, img, patch_size=int(patch_size), patch_overlap=int(patch_overlap)
        )
    return img.squeeze(), pred.squeeze(), f"{ms:.0f} ms"


def _nullcontext():
    import contextlib

    return contextlib.nullcontext()


def build_app():
    import gradio as gr
    import jax

    with gr.Blocks(title="tpuir — image restoration zoo") as app:
        gr.Markdown(
            f"# tpuir demo\nBackend: **{jax.devices()[0].platform}** "
            f"({len(jax.devices())} device(s))"
        )
        with gr.Row():
            subtask = gr.Dropdown(
                [s for subs in TASKS.values() for s in subs],
                value="Gaussian (Color, Non-blind)", label="Task / Subtask",
            )
            model = gr.Dropdown(["Restormer", "MaIR"], label="Model")
            sigma = gr.Dropdown([15, 25, 50], value=25, label="Sigma")
        with gr.Row():
            add_noise = gr.Checkbox(True, label="Add Gaussian noise to input")
            patch_size = gr.Slider(64, 2048, value=256, step=16, label="Patch size")
            patch_overlap = gr.Slider(0, 512, value=48, step=16, label="Patch overlap")
            device = gr.Dropdown(
                device_choices(), value=device_choices()[0], label="Device"
            )
        inp = gr.Image(label="Input image", type="numpy")
        gallery = gr.Gallery(label="Dataset samples", columns=6, height=140)
        sample_paths = gr.State([])
        run_btn = gr.Button("Restore", variant="primary")
        with gr.Row():
            before = gr.Image(label="Model input")
            after = gr.Image(label="Restored")
        # Before/after comparison slider (reference demo.py:410). ImageSlider
        # moved into core gradio in v4/v5; fall back to the side-by-side row
        # above on older installs.
        compare = gr.ImageSlider(label="Compare (drag)", interactive=False) \
            if hasattr(gr, "ImageSlider") else None
        time_box = gr.Textbox(label="Inference time")

        def on_subtask(label):
            for t, subs in TASKS.items():
                if label in subs:
                    task, sub, gray, sigmas = subs[label]
                    models = available_models(task, sub, gray, "Blind" in label)
                    pc = get_patch_config(task, sub, models[0])
                    samples = sample_images(task, sub)
                    return (
                        gr.update(choices=models, value=models[0]),
                        gr.update(visible=sigmas is not None),
                        gr.update(value=(pc or {}).get("patch_size", 256)),
                        gr.update(value=(pc or {}).get("patch_overlap", 48)),
                        samples,
                        samples,
                    )

        subtask.change(
            on_subtask, [subtask],
            [model, sigma, patch_size, patch_overlap, gallery, sample_paths],
        )

        def on_gallery_select(paths, evt: gr.SelectData):
            # Select by index into the known sample list (reference
            # demo.py:160-165) — robust across gradio's evt.value formats.
            return imread_uint8(paths[evt.index])

        gallery.select(on_gallery_select, [sample_paths], inp)

        def do_run(image, subtask_label, model_name, sig, noise, ps, po, dev):
            before_img, after_img, ms = run_restoration(
                image, subtask_label, model_name, sig, noise, ps, po, dev
            )
            outs = [before_img, after_img, ms]
            if compare is not None:
                outs.append((before_img, after_img))
            return tuple(outs)

        run_btn.click(
            do_run,
            [inp, subtask, model, sigma, add_noise, patch_size, patch_overlap,
             device],
            [before, after, time_box] + ([compare] if compare is not None else []),
        )
    return app


def main():
    try:
        import gradio  # noqa: F401
    except ImportError:
        print(
            "gradio is not installed in this environment.\n"
            "Install it with `pip install gradio` and re-run scripts/demo.py.\n"
            "The non-interactive smoke test (scripts/test_demo.py) covers the "
            "same model matrix."
        )
        return 1
    app = build_app()
    app.launch()
    return 0


if __name__ == "__main__":
    sys.exit(main())
