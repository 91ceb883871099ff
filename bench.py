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


def main():
    from tpuir.models.restormer import Restormer

    batch = int(os.environ.get("TPUIR_BENCH_BATCH", "4"))
    size = int(os.environ.get("TPUIR_BENCH_SIZE", "256"))
    iters = int(os.environ.get("TPUIR_BENCH_ITERS", "20"))
    dtype = os.environ.get("TPUIR_BENCH_DTYPE", "float32")

    model = Restormer()
    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, 3), jnp.dtype(dtype)
    )
    params = model.init(jax.random.PRNGKey(0), x[:1])
    if dtype != "float32":
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)

    fn = jax.jit(model.apply)
    # The tunneled TPU backend here dispatches asynchronously and
    # block_until_ready does not actually synchronize, so timing must (a)
    # chain each iteration's input on the previous output and (b) fetch the
    # final result to host.
    np.asarray(jnp.ones((8, 8)))  # tunnel warm-up (first contact is ~2 min)
    np.asarray(fn(params, x))  # compile + first run
    z = x
    t0 = time.perf_counter()
    for _ in range(iters):
        z = fn(params, z)
    np.asarray(z)
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
