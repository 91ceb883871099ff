#!/usr/bin/env python
"""MaIR model-level: serving with fast-exp kernel, batch 1 vs 8 (engine
regime), and MaIRUNet for reference."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timeit(name, fn, x0, *rest, iters=10):
    @jax.jit
    def loop(x0, *rest):
        def body(i, carry):
            acc, x = carry
            y = fn(x, *rest)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, x + (m * 1e-20).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body, (0.0, x0))[0]

    np.asarray(loop(x0, *rest))
    t0 = time.perf_counter()
    np.asarray(loop(x0, *rest))
    dt = (time.perf_counter() - t0) / iters * 1000
    mpix = x0.shape[0] * x0.shape[1] * x0.shape[2] / dt / 1e3
    print(f"{name:52s} {dt:9.2f} ms  {mpix:7.3f} Mpix/s", flush=True)
    return dt


def main():
    np.asarray(jnp.ones((8, 8)))
    rng = np.random.RandomState(0)
    from tpuir.models.mair import MaIR

    mair = MaIR(scan_io_dtype="bfloat16")
    mp = mair.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    for b in (1, 8):
        xm = jnp.asarray(rng.rand(b, 128, 128, 3), jnp.float32)
        timeit(f"MaIR-CDN serving @128 b={b}", lambda q, p: mair.apply(p, q),
               xm, mp)

    mairp = MaIR()
    mpp = mairp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    xm = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
    with jax.default_matmul_precision("float32"):
        timeit("MaIR-CDN parity @128 b=1", lambda q, p: mairp.apply(p, q),
               xm, mpp)


if __name__ == "__main__":
    main()
