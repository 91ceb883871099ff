#!/usr/bin/env python
"""Single-image smoke test over all 7 suites (demo/ images).

Table-driven re-design of the reference scripts/test_demo.py: same demo
file naming (``demo/<prefix>_{noisy,input,target}.*`` in,
``demo/<prefix>_result_<Model>.png`` out), same per-suite sigma and model
lists, matplotlib panels saved to ``demo/<prefix>_panel.png`` (and shown
with --show). Missing weights or demo files skip gracefully.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from tpuir import zoo
from tpuir.config import get_patch_config
from tpuir.core.engine import run_model_inference
from tpuir.core.image_io import imread_uint8, imread_uint16, imwrite_uint
from tpuir.core.metrics import calculate_metrics

SUITES = [
    # (prefix, task, subtask, gray, sigma, models, noisy_suffix, target_suffix)
    ("denoising_gaussian_gray_nonblind", "denoising", "gaussian", True, 50,
     ["REDNet", "DnCNN", "Restormer"], "noisy.bmp", "target.png"),
    ("denoising_gaussian_gray_blind", "denoising", "gaussian", True, 25,
     ["DnCNN", "Restormer"], "noisy.bmp", "target.png"),
    ("denoising_gaussian_color_nonblind", "denoising", "gaussian", False, 25,
     ["Restormer", "MaIR"], "noisy.bmp", "target.png"),
    ("denoising_gaussian_color_blind", "denoising", "gaussian", False, 25,
     ["DnCNN", "Restormer"], "noisy.bmp", "target.png"),
    ("denoising_real", "denoising", "real", False, None,
     ["Restormer", "MaIR"], "noisy.bmp", "target.bmp"),
    ("deblurring_motion", "deblurring", "motion", False, None,
     ["DeblurGANv2 (Inception)", "DeblurGANv2 (MobileNet)", "Restormer", "MaIR"],
     "input.png", "target.png"),
]


def run_suite(prefix, task, subtask, gray, sigma, models, noisy_suffix,
              target_suffix, demo_dir, weights_dir, show):
    in_path = os.path.join(demo_dir, f"{prefix}_{noisy_suffix}")
    tgt_path = os.path.join(demo_dir, f"{prefix}_{target_suffix}")
    if not (os.path.exists(in_path) and os.path.exists(tgt_path)):
        print(f"[skip] demo images for {prefix} not found")
        return
    n_ch = 1 if gray else 3
    input_img = imread_uint8(in_path, n_channels=n_ch)
    target_img = imread_uint8(tgt_path, n_channels=n_ch)

    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ncols = max(3, len(models))
    plt.figure(figsize=(3 * ncols, 6), dpi=150)
    cmap = "gray" if gray else None
    plt.subplot(2, ncols, 1); plt.title("Input"); plt.axis("off")
    plt.imshow(input_img.squeeze(), cmap=cmap)
    plt.subplot(2, ncols, 2); plt.title("Target"); plt.axis("off")
    plt.imshow(target_img.squeeze(), cmap=cmap)

    for i, model_name in enumerate(models):
        print(f"\nTesting {model_name} on {prefix}...")
        # blind variants of the gaussian suites load sigma-free weights
        # (note: "nonblind" contains "blind", so match the suffix)
        load_sigma = None if prefix.endswith("_blind") else sigma
        try:
            model = zoo.get_model_instance(
                task, subtask, model_name, gray=gray, sigma=load_sigma,
                weights_dir=weights_dir,
            )
        except FileNotFoundError:
            print(f"Model weights for {model_name} not found. Skipping this model.")
            continue
        pc = get_patch_config(task, subtask, model_name)
        pred, ms = run_model_inference(model, input_img, **{
            "patch_size": pc["patch_size"], "patch_overlap": pc["patch_overlap"]})
        p, s = calculate_metrics(pred, target_img)
        print(f"  PSNR {p:.2f} dB  SSIM {s:.4f}  ({ms:.0f} ms)")
        clean_name = model_name.replace(" ", "_").replace("(", "").replace(")", "")
        imwrite_uint(os.path.join(demo_dir, f"{prefix}_result_{clean_name}.png"), pred)
        plt.subplot(2, ncols, ncols + 1 + i); plt.title(model_name); plt.axis("off")
        plt.imshow(pred.squeeze(), cmap=cmap)

    plt.savefig(os.path.join(demo_dir, f"{prefix}_panel.png"), bbox_inches="tight")
    if show:
        plt.show()
    plt.close()


def run_defocus(demo_dir, weights_dir, show):
    prefix = "deblurring_defocus"
    c_path = os.path.join(demo_dir, f"{prefix}_input.png")
    t_path = os.path.join(demo_dir, f"{prefix}_target.png")
    if not os.path.exists(t_path):
        print(f"[skip] demo images for {prefix} not found")
        return
    target_img = imread_uint8(t_path)
    for model_name in ["Restormer", "Restormer (Dual-pixel)"]:
        dual = "Dual-pixel" in model_name
        try:
            if dual:
                L = imread_uint16(os.path.join(demo_dir, f"{prefix}_inputL.png"))
                R = imread_uint16(os.path.join(demo_dir, f"{prefix}_inputR.png"))
                input_img = np.concatenate([L, R], axis=2)
            else:
                input_img = imread_uint8(c_path)
        except Exception:
            print(f"[skip] defocus input for {model_name} not found")
            continue
        try:
            model = zoo.get_model_instance(
                "deblurring", "defocus", model_name, weights_dir=weights_dir
            )
        except FileNotFoundError:
            print(f"Model weights for {model_name} not found. Skipping this model.")
            continue
        pc = get_patch_config("deblurring", "defocus", model_name)
        pred, ms = run_model_inference(
            model, input_img, patch_size=pc["patch_size"],
            patch_overlap=pc["patch_overlap"],
        )
        if pred.dtype == np.uint16:
            pred8 = (pred / 257).round().astype(np.uint8)
        else:
            pred8 = pred
        p, s = calculate_metrics(pred8, target_img)
        print(f"  {model_name}: PSNR {p:.2f} dB SSIM {s:.4f} ({ms:.0f} ms)")
        clean_name = model_name.replace(" ", "_").replace("(", "").replace(")", "")
        imwrite_uint(os.path.join(demo_dir, f"{prefix}_result_{clean_name}.png"), pred8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo-dir", default="demo")
    ap.add_argument("--weights-dir", default=None)
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()

    for suite in SUITES:
        run_suite(*suite, demo_dir=args.demo_dir, weights_dir=args.weights_dir,
                  show=args.show)
    run_defocus(args.demo_dir, args.weights_dir, args.show)


if __name__ == "__main__":
    main()
