#!/usr/bin/env python
"""Serving-regime measurements: bf16 inputs, radix-4 scan, engine batch."""

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
    print(f"{name:58s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    np.asarray(jnp.ones((8, 8)))
    rng = np.random.RandomState(0)
    which = set(sys.argv[1:]) or {"all"}

    if "all" in which or "rest" in which:
        from tpuir.models.restormer import Restormer
        from tpuir.models import restormer_fused

        rest = Restormer()
        rp = rest.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        fb = restormer_fused.make_apply_fn(ln_bias=True, mm_bf16=True, row_tile=16)
        xb = jnp.asarray(rng.rand(1, 256, 256, 3), jnp.bfloat16)
        timeit("restormer fused-v2 bf16-in rt=16 b=1 @256",
               lambda q, p: fb(p, q), xb, rp)
        xb4 = jnp.asarray(rng.rand(4, 256, 256, 3), jnp.bfloat16)
        timeit("restormer fused-v2 bf16-in rt=16 b=4 @256",
               lambda q, p: fb(p, q), xb4, rp)
        xb8 = jnp.asarray(rng.rand(8, 256, 256, 3), jnp.bfloat16)
        timeit("restormer fused-v2 bf16-in rt=16 b=8 @256",
               lambda q, p: fb(p, q), xb8, rp)

    if "all" in which or "mair" in which:
        from tpuir.models.mair import MaIR

        xm = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
        # parity mode with radix-4 scan
        mair = MaIR()
        mp = mair.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        def parity(q, p):
            with jax.default_matmul_precision("float32"):
                return mair.apply(p, q)
        timeit("mair parity f32 (radix4) b=1 @128", parity, xm, mp)
        # serving: default matmul precision + bf16 scan io
        mair_s = MaIR(scan_io_dtype="bfloat16")
        timeit("mair serving (radix4 + bf16 scan io) b=1 @128",
               lambda q, p: mair_s.apply(p, q), xm, mp)


if __name__ == "__main__":
    main()
