"""System-level engine benchmark: end-to-end tiled inference per family.

What the reference's ``Avg_Time_ms`` actually measures per image
(/root/reference/src/utils.py:367-453) is the SYSTEM time: patch grid,
host<->device transfers, forward, Gaussian-window blend. The fair baseline
is therefore ``a100_system_mpix_per_s`` from benchmarks/a100_estimates.json
(the derived A100 stream plus its serialized PCIe + single-thread numpy
blend — see BASELINE.md), not the bare device stream.

This script runs ``run_model_inference`` (the production engine: normalize,
C++ patch extract, batched jitted forward, C++ blend-stitch, dtype restore)
on a test-matrix-shaped image per family in serving precision with random
weights, and reports end-to-end Mpix/s over OUTPUT pixels (overlap
redundancy is charged to us, not discounted).

Run on the TPU:  python benchmarks/engine_system.py [--only SUBSTR]
Writes benchmarks/engine_system.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from tpuir.core.engine import InferenceModel, run_model_inference  # noqa: E402
from tpuir.core.image_io import normalize_signed  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "engine_system.json")


def _init(model, in_ch, px=64):
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, px, px, in_ch), jnp.float32))


def build_cases():
    """(row name, a100_estimates key, InferenceModel, image HxWxC, kwargs)."""
    from tpuir.models.dncnn import DnCNN
    from tpuir.models.rednet import REDNet
    from tpuir.models.restormer import Restormer
    from tpuir.models import restormer_fused
    from tpuir.models.mair import MaIR
    from tpuir.models.mair_unet import MaIRUNet
    from tpuir.models.deblurgan import FPNInception, FPNMobileNet

    cases = []

    # --- DnCNN gray blind, BSD68-shaped image, patch 256/48
    m = DnCNN(1, 1, 64, 17)
    cases.append((
        "DnCNN gray @321x481", "DnCNN-nonblind-gray@256",
        InferenceModel(name="DnCNN", apply_fn=m.apply, params=_init(m, 1),
                       patch_size=256, patch_overlap=48,
                       compute_dtype="bfloat16"),
        (321, 481, 1), {},
    ))

    # --- REDNet sigma50, BSD68-shaped, patch 128/32
    m = REDNet()
    cases.append((
        "REDNet gray @321x481", "REDNet@128",
        InferenceModel(name="REDNet", apply_fn=m.apply, params=_init(m, 1),
                       patch_size=128, patch_overlap=32,
                       compute_dtype="bfloat16"),
        (321, 481, 1), {},
    ))

    # --- Restormer color blind (fused bf16 serving), patch 256/48
    m = Restormer()
    fused = restormer_fused.make_apply_fn(
        ln_bias=False, mm_bf16=True, row_tile=16, io_bf16=True, fast_gelu=True)
    cases.append((
        "Restormer color @321x481", "Restormer@256",
        InferenceModel(name="Restormer", apply_fn=fused, params=_init(m, 3),
                       patch_size=256, patch_overlap=48, pad_factor=8,
                       compute_dtype="float32"),
        (321, 481, 3), {},
    ))

    # --- MaIR-CDN (Kodak-shaped 768x512), patch 128/32
    m = MaIR(embed_dim=180, depths=(6,) * 6, d_state=16, ssm_ratio=1.3,
             mlp_ratio=2.0, scan_len=4, scan_io_dtype="bfloat16")
    cases.append((
        "MaIR-CDN color @512x768", "MaIR-CDN@128",
        InferenceModel(name="MaIR", apply_fn=m.apply, params=_init(m, 3),
                       patch_size=128, patch_overlap=32, pad_factor=8,
                       compute_dtype="float32"),
        (512, 768, 3), {},
    ))

    # --- MaIRUNet motion (GoPro-shaped 1280x720), patch 384/128
    m = MaIRUNet(dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
                 ssm_ratio=2.0, flp_ratio=4.0, mlp_ratio=1.5, scan_len=4,
                 scan_io_dtype="bfloat16")
    cases.append((
        "MaIRUNet motion @720x1280", "MaIRUNet@384",
        InferenceModel(name="MaIR", apply_fn=m.apply, params=_init(m, 3),
                       patch_size=384, patch_overlap=128, pad_factor=8,
                       compute_dtype="float32"),
        (720, 1280, 3), {},
    ))

    # --- DeblurGANv2 Inception (GoPro-shaped), patch 768/128
    # (init at >=160: the VALID-padded trunk collapses 64^2 before the
    # FPN's reflect pads)
    m = FPNInception()
    cases.append((
        "DeblurGANv2-Inception @720x1280", "DeblurGANv2-Inception@768",
        InferenceModel(name="DeblurGANv2 (Inception)", apply_fn=m.apply,
                       params=_init(m, 3, 160), patch_size=768, patch_overlap=128,
                       pad_block=32, normalize=normalize_signed,
                       postprocess=lambda x: (x + 1) / 2.0,
                       compute_dtype="float32"),
        (720, 1280, 3), {},
    ))

    # --- DeblurGANv2 MobileNet (GoPro-shaped; single 2048 patch),
    # serving = phase-packed path (zoo precision='serving')
    m = FPNMobileNet()
    mph = FPNMobileNet(phase_io=True)
    cases.append((
        "DeblurGANv2-MobileNet @720x1280", "DeblurGANv2-MobileNet@2048",
        InferenceModel(name="DeblurGANv2 (MobileNet)", apply_fn=mph.apply,
                       params=_init(m, 3), patch_size=2048, patch_overlap=384,
                       pad_block=32, normalize=normalize_signed,
                       postprocess=lambda x: (x + 1) / 2.0,
                       phase_io=True, phase_factor=4,
                       compute_dtype="float32"),
        (720, 1280, 3), {},
    ))
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="substring filter; merge into existing json")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    est = {}
    est_path = os.path.join(HERE, "a100_estimates.json")
    if os.path.exists(est_path):
        est = json.load(open(est_path))["results"]

    results = {}
    if args.only and os.path.exists(OUT):
        results = json.load(open(OUT)).get("results", {})

    rng = np.random.RandomState(0)
    for name, est_key, bundle, shape, kw in build_cases():
        if args.only and args.only.lower() not in name.lower():
            continue
        img = (rng.rand(*shape) * 255).astype(np.uint8)
        # warm-up (compile) + measure reps
        run_model_inference(bundle, img, **kw)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run_model_inference(bundle, img, **kw)
            times.append((time.perf_counter() - t0) * 1e3)
        ms = float(np.median(times))
        mpix = shape[0] * shape[1] / ms / 1e3
        a100_sys = est.get(est_key, {}).get("a100_system_mpix_per_s")
        row = {
            "image": f"{shape[0]}x{shape[1]}",
            "ms_per_image": round(ms, 1),
            "mpix_per_s": round(mpix, 3),
            "a100_system_mpix_per_s": a100_sys,
            "vs_a100_system": round(mpix / a100_sys, 3) if a100_sys else None,
        }
        results[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)

    json.dump(
        {
            "note": "end-to-end run_model_inference wall time per image, serving "
                    "precision, random weights; Mpix/s over output pixels "
                    "(overlap redundancy charged to this build). Baseline = "
                    "derived A100 SYSTEM stream (BASELINE.md).",
            "results": results,
        },
        open(OUT, "w"), indent=1,
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
