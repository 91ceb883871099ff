#!/usr/bin/env python
"""Benchmark: flagship Restormer throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures steady-state Mpix/s for the released Restormer config (dim 48,
blocks 4/6/6/8) on 256x256 patches — the patch size the harness uses for
Restormer denoising (PATCH_CONFIG). Runs on whatever the default JAX
backend is (the tunneled TPU v5e here; CPU elsewhere).

vs_baseline: ratio against the BASELINE.json target of 4x an A100's
Mpix/s. The reference publishes no numbers (BASELINE.md), so the A100
figure is an estimate from Restormer's ~141 GFLOPs @256^2 at 35% fp32
utilization of 19.5 TFLOP/s => ~3.0 Mpix/s; override with
TPUIR_BENCH_A100_MPIXPS. Target = 4x that.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the tunneled remote compiler takes minutes for
# the fused model, the cache makes repeat bench runs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from tpuir.models.restormer import Restormer

    batch = int(os.environ.get("TPUIR_BENCH_BATCH", "1"))
    size = int(os.environ.get("TPUIR_BENCH_SIZE", "256"))
    iters = int(os.environ.get("TPUIR_BENCH_ITERS", "10"))
    dtype = os.environ.get("TPUIR_BENCH_DTYPE", "float32")

    model = Restormer()
    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, 3), jnp.dtype(dtype)
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    if dtype != "float32":
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)

    use_fused = (
        jax.default_backend() != "cpu" and os.environ.get("TPUIR_FUSED", "1") != "0"
    )
    if use_fused:
        from tpuir.models import restormer_fused

        fused_fn = restormer_fused.make_apply_fn(ln_bias=True)

        def fn(p, x):
            with jax.default_matmul_precision("float32"):
                return fused_fn(p, x)

        fn = jax.jit(fn)
    else:

        def fn(p, x):
            with jax.default_matmul_precision("float32"):
                return model.apply(p, x)

        fn = jax.jit(fn)
    # The tunneled TPU backend dispatches asynchronously (block_until_ready
    # does not truly sync) and adds per-dispatch latency, so the iteration
    # loop runs inside ONE jitted program: each iteration's input chains on
    # the previous mean (defeats loop-invariant hoisting), and only a
    # scalar is fetched.
    np.asarray(jnp.ones((8, 8)))  # tunnel warm-up (first contact is ~2 min)

    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            y = fn(p, qq)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, qq + (m * 1e-20).astype(qq.dtype)

        return jax.lax.fori_loop(0, iters, body, (0.0, q))[0]

    np.asarray(loop(params, x))  # compile + first run
    t0 = time.perf_counter()
    np.asarray(loop(params, x))
    dt = time.perf_counter() - t0

    mpix_per_s = batch * size * size * iters / dt / 1e6
    a100_est = float(os.environ.get("TPUIR_BENCH_A100_MPIXPS", "3.0"))
    target = 4.0 * a100_est
    print(
        json.dumps(
            {
                "metric": f"restormer_{dtype}_{size}px_throughput",
                "value": round(mpix_per_s, 3),
                "unit": "Mpix/s/chip",
                "vs_baseline": round(mpix_per_s / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
