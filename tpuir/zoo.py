"""Model zoo: one registry routing (task, subtask, model, gray, sigma) to a
ready-to-run InferenceModel bundle.

This collapses the reference's five ad-hoc adapter modules and its router
``get_model_instance`` (/root/reference/src/utils.py:216-267) into a single
table-driven zoo. Checkpoints are the originally released files, read with
the torch-free loader; configs that the reference keeps in YAML option
files are encoded here as data (paths, LayerNorm types, channels from
src/restormer/options/*.yml and src/mair/options/*.yml).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from tpuir.config import ROOT_WEIGHTS_DIR, get_patch_config
from tpuir.core.engine import InferenceModel
from tpuir.core.image_io import normalize_signed
from tpuir.utils.misc import param_count
from tpuir.weights.torch_pickle import load_torch_checkpoint
from tpuir.weights.caffe import caffemodel_to_state_dict


def _flat(sd):
    """Flatten a possibly-nested checkpoint dict to dotted numpy leaves."""
    out = {}

    def rec(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                rec(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            out[prefix] = np.asarray(obj)

    rec("", sd)
    return out


def resolve_precision(precision: Optional[str] = None) -> str:
    """'parity' (default: true-float32 matmuls) or 'serving' (bf16 MXU
    passes with float32 accumulation — the documented fast mode, validated
    by tests/test_serving_mode.py and scripts/validate_serving.py)."""
    p = precision or os.environ.get("TPUIR_PRECISION", "parity")
    if p not in ("parity", "serving"):
        raise ValueError(f"unknown precision mode {p!r} (parity|serving)")
    return p


def _load_sd(path: str, key: Optional[str] = None):
    ckpt = load_torch_checkpoint(path)
    if key is not None and isinstance(ckpt, dict) and key in ckpt:
        ckpt = ckpt[key]
    return {k: np.asarray(v) for k, v in _flat(ckpt).items()}


# --------------------------------------------------------------------------
# Builders
# --------------------------------------------------------------------------


def build_rednet(weights_dir: str, sigma, precision: str = "parity") -> InferenceModel:
    from tpuir.models import rednet as m

    pt = os.path.join(weights_dir, "REDNet", f"{sigma}.pt")
    cm = os.path.join(weights_dir, "REDNet", f"{sigma}.caffemodel")
    if os.path.exists(pt):
        sd = _load_sd(pt)
    elif os.path.exists(cm):
        sd = caffemodel_to_state_dict(cm)
    else:
        raise FileNotFoundError(pt)
    model = m.REDNet()
    params = m.convert_state_dict(sd)
    pc = get_patch_config("denoising", "gaussian", "REDNet")
    return InferenceModel(
        name="REDNet", apply_fn=model.apply, params=params,
        patch_size=pc["patch_size"], patch_overlap=pc["patch_overlap"],
        param_count=param_count(params),
        compute_dtype="bfloat16" if precision == "serving" else None,
    )


def build_dncnn(weights_dir: str, gray: bool, sigma, precision: str = "parity") -> InferenceModel:
    from tpuir.models import dncnn as m

    if gray:
        if sigma is not None:
            fname, nc, nb = f"dncnn_{sigma}.pth", 1, 17
        else:
            fname, nc, nb = "dncnn_gray_blind.pth", 1, 20
    else:
        if sigma is not None:
            raise ValueError("DnCNN color is blind-only")
        fname, nc, nb = "dncnn_color_blind.pth", 3, 20
    sd = _load_sd(os.path.join(weights_dir, "DnCNN", fname))
    model = m.DnCNN(in_nc=nc, out_nc=nc, nc=64, nb=nb)
    params = m.convert_state_dict(sd, nb)
    pc = get_patch_config("denoising", "gaussian", "DnCNN")
    return InferenceModel(
        name="DnCNN", apply_fn=model.apply, params=params,
        patch_size=pc["patch_size"], patch_overlap=pc["patch_overlap"],
        param_count=param_count(params),
        compute_dtype="bfloat16" if precision == "serving" else None,
    )


def build_deblurgan(weights_dir: str, variant: str, precision: str = "parity") -> InferenceModel:
    from tpuir.models import deblurgan as m

    # MobileNet serving runs the phase-packed path: pack4 host<->device
    # layout (native gather/blend), packed entry/f1/f2/lateral0/smooth2
    # and the folded tail — every logical >=1024^2 small-C conv becomes an
    # MXU-shaped packed conv re-derived from the SAME checkpoint params
    # (models/deblurgan/fpn_mobilenet.py, fold.py). Exact to float noise;
    # measured on device in benchmarks/ab_phase_io.py. The plain fold_tail
    # alone measured perf-neutral (ab_fold_tail.py) and stays opt-in.
    serving = precision == "serving"
    if variant == "Inception":
        sd = _load_sd(
            os.path.join(weights_dir, "DeblurGANv2", "fpn_inception.h5"), key="model"
        )
        # Inception's VALID-padded trunk can't stay grid-aligned under
        # packing, so serving packs only the tail (11.3 -> 10.1 ms @768,
        # benchmarks/ab_inception_tail.py; exact to 5e-6)
        model = m.FPNInception(packed_tail=serving)
        params = m.convert_inception(sd)
        name = "DeblurGANv2 (Inception)"
        phase = False
    else:
        sd = _load_sd(
            os.path.join(weights_dir, "DeblurGANv2", "fpn_mobilenet.h5"), key="model"
        )
        model = m.FPNMobileNet(phase_io=serving)
        params = m.convert_mobilenet(sd)
        name = "DeblurGANv2 (MobileNet)"
        phase = serving
    pc = get_patch_config("deblurring", "motion", name)
    return InferenceModel(
        name=name, apply_fn=model.apply, params=params,
        patch_size=pc["patch_size"], patch_overlap=pc["patch_overlap"],
        pad_block=32, normalize=normalize_signed,
        postprocess=lambda x: (x + 1) / 2.0,
        param_count=param_count(params),
        phase_io=phase, phase_factor=4,
        # InstanceNorm train-mode statistics amplify bf16 input quantization
        # on near-constant channels, so serving keeps f32 activations and
        # only drops the true-f32 matmul pin (convs run as bf16 MXU passes)
        compute_dtype="float32" if precision == "serving" else None,
    )


# Restormer released configs: (relative weights path, in_ch, out_ch,
# layer_norm_bias [WithBias=True], dual_pixel) — facts from the 12 option
# YAMLs (src/restormer/options/*.yml).
RESTORMER_CONFIGS = {
    ("denoising", "gaussian", True, 15): ("denoising/gaussian_gray_denoising_sigma15.pth", 1, 1, False, False),
    ("denoising", "gaussian", True, 25): ("denoising/gaussian_gray_denoising_sigma25.pth", 1, 1, False, False),
    ("denoising", "gaussian", True, 50): ("denoising/gaussian_gray_denoising_sigma50.pth", 1, 1, False, False),
    ("denoising", "gaussian", True, None): ("denoising/gaussian_gray_denoising_blind.pth", 1, 1, False, False),
    ("denoising", "gaussian", False, 15): ("denoising/gaussian_color_denoising_sigma15.pth", 3, 3, False, False),
    ("denoising", "gaussian", False, 25): ("denoising/gaussian_color_denoising_sigma25.pth", 3, 3, False, False),
    ("denoising", "gaussian", False, 50): ("denoising/gaussian_color_denoising_sigma50.pth", 3, 3, False, False),
    ("denoising", "gaussian", False, None): ("denoising/gaussian_color_denoising_blind.pth", 3, 3, False, False),
    ("denoising", "real", False, None): ("denoising/real_denoising.pth", 3, 3, False, False),
    ("deblurring", "motion", False, None): ("deblurring/motion_deblurring.pth", 3, 3, True, False),
    ("deblurring", "defocus", False, None): ("deblurring/single_image_defocus_deblurring.pth", 3, 3, True, False),
    ("deblurring", "defocus-dual", False, None): ("deblurring/dual_pixel_defocus_deblurring.pth", 6, 3, True, True),
}


def build_restormer(weights_dir: str, task: str, subtask: str, gray: bool, sigma,
                    precision: str = "parity") -> InferenceModel:
    from tpuir.models import restormer as m

    key = (task, subtask, gray, sigma)
    if key not in RESTORMER_CONFIGS:
        raise ValueError(f"no Restormer config for {key}")
    rel, in_ch, out_ch, ln_bias, dual = RESTORMER_CONFIGS[key]
    sd = _load_sd(os.path.join(weights_dir, "Restormer", rel), key="params")
    model = m.Restormer(
        inp_channels=in_ch, out_channels=out_ch,
        layer_norm_bias=ln_bias, dual_pixel_task=dual,
    )
    params = m.convert_state_dict(
        sd, layer_norm_bias=ln_bias, dual_pixel_task=dual
    )
    # On TPU, serve through the fused Pallas blocks: ~1.2x faster than the
    # XLA path at float32-parity precision (and more accurate than XLA's
    # default bf16 matmul passes). TPUIR_FUSED=0 falls back to pure XLA.
    # 'serving' precision runs the fused blocks with single-pass bf16 MXU
    # matmuls + float32 accumulation and streams activations in bf16
    # (~1.8x over parity; deltas validated by scripts/validate_serving.py).
    import jax

    serving = precision == "serving"
    apply_fn = model.apply
    if (
        jax.default_backend() not in ("cpu",)
        and os.environ.get("TPUIR_FUSED", "1") != "0"
    ):
        from tpuir.models import restormer_fused

        # serving additionally streams inter-block activations in bf16
        # (io_bf16) and uses the sigmoid-form GELU (fast_gelu) — both
        # bounded by the trained-like section of validate_serving.py
        apply_fn = restormer_fused.make_apply_fn(
            ln_bias=ln_bias, dual_pixel_task=dual,
            mm_bf16=serving, row_tile=16 if serving else 8,
            io_bf16=serving, fast_gelu=serving,
        )
    pc = get_patch_config(task, subtask.split("-")[0], "Restormer")
    return InferenceModel(
        name="Restormer", apply_fn=apply_fn, params=params,
        patch_size=pc["patch_size"], patch_overlap=pc["patch_overlap"],
        pad_factor=8, param_count=param_count(params),
        # f32 activations at the engine boundary (input quantization alone
        # costs ~5 uint8 LSB); bf16 lives inside the fused kernels
        compute_dtype="float32" if serving else None,
    )


def build_mair(weights_dir: str, task: str, subtask: str, sigma,
               precision: str = "parity") -> InferenceModel:
    # MaIR 'serving' mode: default-precision matmuls (bf16 MXU passes) and
    # bf16 IO at the NSS gather / Pallas scan boundary; scan math stays
    # float32 in-kernel. compute_dtype='float32' keeps activations f32 but
    # skips the engine's true-f32 matmul pin.
    serving = precision == "serving"
    io_dtype = "bfloat16" if serving else "float32"
    if task == "denoising" and subtask == "gaussian":
        from tpuir.models import mair as m

        sd = _load_sd(
            os.path.join(weights_dir, "MaIR", "denoising", f"MaIR_CDN_s{sigma}.pth"),
            key="params",
        )
        # config: src/mair/options/test_MaIR_CDN_s15.yml:55-70
        model = m.MaIR(
            embed_dim=180, depths=(6,) * 6, d_state=16, ssm_ratio=1.3,
            mlp_ratio=2.0, scan_len=4, scan_io_dtype=io_dtype,
        )
        params = m.convert_state_dict(sd, depths=(6,) * 6, embed_dim=180, ssm_ratio=1.3)
    else:
        from tpuir.models import mair_unet as m

        rel = (
            os.path.join("denoising", "MaIR_RealDN.pth")
            if subtask == "real"
            else os.path.join("deblurring", "MaIR_MotionDeblur.pth")
        )
        sd = _load_sd(os.path.join(weights_dir, "MaIR", rel), key="params")
        # config: src/mair/realDenoising/options/test_MaIR_RealDN.yml:17-34
        model = m.MaIRUNet(
            dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
            ssm_ratio=2.0, flp_ratio=4.0, mlp_ratio=1.5, scan_len=4,
            scan_io_dtype=io_dtype,
        )
        params = m.convert_state_dict(
            sd, dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4, ssm_ratio=2.0
        )
    pc = get_patch_config(task, subtask, "MaIR")
    return InferenceModel(
        name="MaIR", apply_fn=model.apply, params=params,
        patch_size=pc["patch_size"], patch_overlap=pc["patch_overlap"],
        pad_factor=8, param_count=param_count(params),
        compute_dtype="float32" if serving else None,
    )


def get_model_instance(
    task: str,
    subtask: str,
    model_name: str,
    gray: bool = False,
    sigma=None,
    weights_dir: Optional[str] = None,
    precision: Optional[str] = None,
) -> InferenceModel:
    """Route a harness configuration to a loaded model bundle.

    ``precision``: 'parity' (default; true-float32 matmuls for the 0.05 dB
    CSV budget) or 'serving' (bf16 MXU passes + f32 accumulation — the
    fast documented mode). Defaults to the TPUIR_PRECISION env var.

    Raises ValueError for unsupported combinations and propagates
    FileNotFoundError when weights are absent — the harness treats the
    latter as 'skip suite cell', matching the reference
    (scripts/tests.py:46-50).
    """
    weights_dir = weights_dir or ROOT_WEIGHTS_DIR
    precision = resolve_precision(precision)
    key = model_name.split(" ")[0]
    if key == "REDNet":
        if task == "denoising" and subtask == "gaussian" and sigma is not None:
            return build_rednet(weights_dir, sigma, precision)
    elif key == "DnCNN":
        if task == "denoising" and subtask == "gaussian":
            if gray or sigma is None:
                return build_dncnn(weights_dir, gray, sigma, precision)
    elif key == "DeblurGANv2":
        if task == "deblurring" and subtask == "motion":
            if "Inception" in model_name:
                return build_deblurgan(weights_dir, "Inception", precision)
            if "MobileNet" in model_name:
                return build_deblurgan(weights_dir, "MobileNet", precision)
    elif key == "Restormer":
        sub = "defocus-dual" if ("Dual-pixel" in model_name and subtask == "defocus") else subtask
        try:
            return build_restormer(weights_dir, task, sub, gray, sigma, precision)
        except ValueError:
            pass
    elif key == "MaIR":
        if task == "denoising" and subtask == "gaussian" and not gray and sigma is not None:
            return build_mair(weights_dir, task, subtask, sigma, precision)
        if task == "denoising" and subtask == "real":
            return build_mair(weights_dir, task, subtask, None, precision)
        if task == "deblurring" and subtask == "motion":
            return build_mair(weights_dir, task, subtask, None, precision)
    raise ValueError("No model instance found for current configuration.")
