#!/usr/bin/env python
"""Per-model throughput benchmark at each model's harness patch size.

Prints a Mpix/s/chip table (and writes benchmarks/results.json). Random
weights — throughput does not depend on weight values. Measurements run
inside a single jitted fori_loop with a scalar fetch (see bench.py for why
that is required on the tunneled backend) at float32 parity precision.
"""

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


def cases():
    from tpuir.models.dncnn import DnCNN
    from tpuir.models.rednet import REDNet
    from tpuir.models.restormer import Restormer
    from tpuir.models import restormer_fused
    from tpuir.models.mair import MaIR
    from tpuir.models.deblurgan import FPNMobileNet

    # (name, module, apply override, input channels, harness patch size)
    return [
        ("REDNet@128", REDNet(), None, 1, 128),
        ("DnCNN@256", DnCNN(1, 1, 64, 17), None, 1, 256),
        ("Restormer@256 (fused)", Restormer(),
         restormer_fused.make_apply_fn(ln_bias=True), 3, 256),
        ("DeblurGANv2-MobileNet@256", FPNMobileNet(), None, 3, 256),
        ("MaIR-CDN@128", MaIR(), None, 3, 128),
    ]


def bench_case(model, apply_override, in_ch, size, iters=10):
    x = jnp.asarray(np.random.RandomState(0).rand(1, size, size, in_ch), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, in_ch), jnp.float32))
    apply_fn = apply_override or model.apply

    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            with jax.default_matmul_precision("float32"):
                y = apply_fn(p, qq)
            m = jnp.mean(y)
            return acc + m, qq + m * 1e-20

        return jax.lax.fori_loop(0, iters, body, (0.0, q))[0]

    np.asarray(loop(params, x))  # compile
    t0 = time.perf_counter()
    np.asarray(loop(params, x))
    dt = time.perf_counter() - t0
    per_ms = dt / iters * 1000
    return per_ms, size * size / per_ms / 1000.0


def main():
    np.asarray(jnp.ones((8, 8)))  # tunnel warm-up
    results = {}
    print(f"{'Model':30s} {'ms/fwd':>9s} {'Mpix/s':>9s}")
    for name, model, override, in_ch, size in cases():
        try:
            ms, mpix = bench_case(model, override, in_ch, size)
            results[name] = {"ms_per_forward": round(ms, 2), "mpix_per_s": round(mpix, 3)}
            print(f"{name:30s} {ms:9.1f} {mpix:9.2f}", flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"{name:30s} failed: {type(e).__name__}", flush=True)
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/results.json", "w") as f:
        json.dump(
            {"device": jax.devices()[0].platform, "precision": "float32(parity)",
             "results": results}, f, indent=2,
        )
    print("written benchmarks/results.json")


if __name__ == "__main__":
    main()
