#!/usr/bin/env python
"""Restormer fused serving sweep: row_tile x batch at 256."""

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
    from tpuir.models.restormer import Restormer
    from tpuir.models import restormer_fused

    rest = Restormer()
    rp = rest.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    for rt in (16, 32):
        for b in (8, 16):
            fn = restormer_fused.make_apply_fn(ln_bias=True, mm_bf16=True,
                                               row_tile=rt)
            x = jnp.asarray(rng.rand(b, 256, 256, 3), jnp.float32)
            timeit(f"Restormer fused serving rt={rt} b={b}",
                   lambda q, p, f=fn: f(p, q), x, rp)


if __name__ == "__main__":
    main()
