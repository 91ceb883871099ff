"""A/B: bf16 activations+params for FPN-MobileNet serving — speed and the
trained-like accuracy gate.

The micro breakdown (micro_mobilenet.py) shows the backbone is
bandwidth-bound at 4-5x roofline from lane-underfilled f32 layouts
(C=32..144); bf16 halves the bytes. The quality question is train-mode
InstanceNorm amplifying bf16 input quantization (zoo.py note), so this
script measures BOTH:

  * speed: full-model @2048 forward, f32 acts (current serving) vs bf16
    params+acts (TrainNorm keeps f32 statistics internally);
  * accuracy: engine-level PSNR on trained-like (head-scaled, near
    identity) weights against the clean reference photo — the same
    protocol as scripts/validate_serving.py run_trained_like — for
    parity (f32-pinned), serving (f32 acts), and bf16 serving.

Adopt bf16 only if |PSNR(serving) - PSNR(bf16)| stays inside the 0.05 dB
CSV budget with margin.

Run: python benchmarks/ab_mobilenet_bf16.py
"""

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
from tpuir.core.metrics import calculate_metrics  # noqa: E402
from tpuir.models.deblurgan import FPNMobileNet  # noqa: E402

ITERS = 20


def timeit(apply_fn, params, x):
    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            m = apply_fn(p, qq).astype(jnp.float32).mean()
            return acc + m, qq + (m * 1e-20).astype(qq.dtype)
        return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), q))[0]

    np.asarray(loop(params, x))
    t0 = time.perf_counter()
    np.asarray(loop(params, x))
    return (time.perf_counter() - t0) / ITERS * 1e3


def _clean_image():
    import cv2

    img = cv2.imread("/root/reference/demo/deblurring_motion_target.png")
    if img is None:
        return (np.random.RandomState(3).rand(256, 320, 3) * 255).astype(np.uint8)
    return np.ascontiguousarray(cv2.cvtColor(img, cv2.COLOR_BGR2RGB)[:256, :320])


def _scale_head(params, factor=0.05):
    import copy

    p = copy.deepcopy(jax.device_get(params))
    sub = p["params"]["final"]
    for k in list(sub.keys()):
        sub[k] = np.asarray(sub[k]) * factor
    return p


def bundle(params, dtype):
    return InferenceModel(
        name="g", apply_fn=FPNMobileNet().apply, params=params, patch_size=2048,
        patch_overlap=384, pad_block=32, normalize=normalize_signed,
        postprocess=lambda x: (x + 1) / 2.0, compute_dtype=dtype,
    )


def main():
    m = FPNMobileNet()
    rng = np.random.RandomState(0)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    # --- speed @2048
    x = jnp.asarray(rng.rand(1, 2048, 2048, 3).astype(np.float32) * 2 - 1)
    ms32 = timeit(m.apply, p, x)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    msb = timeit(m.apply, pb, x.astype(jnp.bfloat16))
    print(f"@2048 fwd: f32 acts {ms32:.2f} ms -> bf16 {msb:.2f} ms "
          f"({ms32 / msb:.2f}x)", flush=True)

    # --- trained-like accuracy through the production engine
    pt = _scale_head(p)
    ptb = jax.tree.map(lambda a: np.asarray(a, np.float32), pt)
    clean = _clean_image()
    rows = {}
    for label, b in [
        ("parity (f32-pinned)", bundle(pt, None)),
        ("serving (f32 acts)", bundle(pt, "float32")),
        ("serving bf16 acts", InferenceModel(
            name="g", apply_fn=m.apply,
            params=jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), ptb),
            patch_size=2048, patch_overlap=384, pad_block=32,
            normalize=normalize_signed, postprocess=lambda x: (x + 1) / 2.0,
            compute_dtype="bfloat16")),
    ]:
        out, _ms = run_model_inference(b, clean)
        psnr, _ = calculate_metrics(out, clean)
        rows[label] = float(psnr)
        print(f"  {label:22s}: PSNR vs clean = {psnr:.4f} dB", flush=True)
    d_srv = rows["serving (f32 acts)"] - rows["serving bf16 acts"]
    d_par = rows["parity (f32-pinned)"] - rows["serving bf16 acts"]
    print(f"  bf16 delta vs serving = {d_srv:+.4f} dB, vs parity = {d_par:+.4f} dB")


if __name__ == "__main__":
    main()
