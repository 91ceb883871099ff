#!/usr/bin/env python
"""Fused-block v2 (qk/v split) timing: row_tile sweep, bf16 vs f32."""

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
    print(f"{name:55s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    np.asarray(jnp.ones((8, 8)))
    rng = np.random.RandomState(0)
    from tpuir.models.restormer import Restormer
    from tpuir.models import restormer_fused

    rest = Restormer()
    rp = rest.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    x = jnp.asarray(rng.rand(1, 256, 256, 3), jnp.float32)

    for rt in [int(a) for a in (sys.argv[1:] or ["8", "16", "32"])]:
        fb = restormer_fused.make_apply_fn(ln_bias=True, mm_bf16=True, row_tile=rt)
        timeit(f"restormer fused-v2 bf16 rt={rt} b=1 @256",
               lambda q, p: fb(p, q), x, rp)
    ff = restormer_fused.make_apply_fn(ln_bias=True, row_tile=8)
    timeit("restormer fused-v2 f32 rt=8 b=1 @256", lambda q, p: ff(p, q), x, rp)


if __name__ == "__main__":
    main()
