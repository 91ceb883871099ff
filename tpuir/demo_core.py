"""Plain-Python core of the Gradio demo — importable and testable without
gradio installed (VERDICT r2 item 6).

Holds the task table, the model-availability matrix, the sample-gallery
scan, the device selector values, and the three event handlers
(``run_restoration``, ``subtask_change``, ``gallery_select``) that the
reference wires into Blocks (/root/reference/scripts/demo.py:19-77,
160-165, 219-231). ``scripts/demo.py`` is the thin gradio shell around
these.
"""

from __future__ import annotations

import contextlib
import os
from glob import glob

import numpy as np

from tpuir import zoo
from tpuir.config import ROOT_DATASET_DIR, get_patch_config
from tpuir.core.degrade import add_gaussian_noise
from tpuir.core.engine import run_model_inference
from tpuir.core.image_io import imread_uint8
from tpuir.utils.natsort import natsorted

# label -> (task, subtask, gray, sigmas or None=blind/n.a.)
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


def lookup_subtask(label):
    """Resolve a UI label to (task, subtask, gray, sigmas)."""
    for subs in TASKS.values():
        if label in subs:
            return subs[label]
    raise ValueError(f"unknown subtask label: {label!r}")


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


def subtask_change(label):
    """Dropdown-change handler payload: (models, sigma_visible, patch_size,
    patch_overlap, sample_paths) — plain data, no gradio types."""
    task, sub, gray, sigmas = lookup_subtask(label)
    models = available_models(task, sub, gray, "Blind" in label)
    pc = get_patch_config(task, sub, models[0]) or {}
    samples = sample_images(task, sub)
    return (
        models,
        sigmas is not None,
        pc.get("patch_size", 256),
        pc.get("patch_overlap", 48),
        samples,
    )


def gallery_select(paths, index):
    """Gallery-select handler: load sample ``index`` of the known list
    (reference demo.py:160-165) — robust across gradio's evt.value formats."""
    return imread_uint8(paths[index])


def run_restoration(image, subtask_label, model_name, sigma, add_noise,
                    patch_size, patch_overlap, device_name=None, progress=None,
                    get_model=None):
    """The Restore-button handler (reference demo.py:219-231). Returns
    (model_input_img, restored_img, time_string).

    ``get_model`` overrides the zoo router (tests inject a tiny model)."""
    import jax

    task, subtask, gray, sigmas = lookup_subtask(subtask_label)
    if image is None:
        raise ValueError("upload or pick an image first")
    img = np.asarray(image)
    if gray and img.ndim == 3:
        img = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        img = img.round().astype(np.uint8)[:, :, None]
    blind = "Blind" in subtask_label
    get_model = get_model or zoo.get_model_instance
    model = get_model(
        task, subtask, model_name, gray=gray,
        sigma=None if blind or sigmas is None else sigma,
    )
    if add_noise and subtask == "gaussian":
        img = (add_gaussian_noise(img, sigma) * 255).round().astype(np.uint8)
    dev_ctx = (
        jax.default_device(_resolve_device(device_name))
        if device_name else contextlib.nullcontext()
    )
    with dev_ctx:
        pred, ms = run_model_inference(
            model, img, patch_size=int(patch_size), patch_overlap=int(patch_overlap),
            progress_cb=progress,
        )
    return img.squeeze(), pred.squeeze(), f"{ms:.0f} ms"
