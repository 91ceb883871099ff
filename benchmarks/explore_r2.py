#!/usr/bin/env python
"""Round-2 exploration: how far do batch>1 and bf16 get us on TPU?"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def bench(name, apply_fn, params, batch, size, in_ch, dtype, precision, iters=10):
    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, in_ch), jnp.dtype(dtype)
    )
    if dtype != "float32":
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params
        )

    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            if precision is not None:
                with jax.default_matmul_precision(precision):
                    y = apply_fn(p, qq)
            else:
                y = apply_fn(p, qq)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, qq + (m * 1e-20).astype(qq.dtype)

        return jax.lax.fori_loop(0, iters, body, (0.0, q))[0]

    np.asarray(loop(params, x))  # compile
    t0 = time.perf_counter()
    np.asarray(loop(params, x))
    dt = time.perf_counter() - t0
    per_ms = dt / iters * 1000
    mpix = batch * size * size / per_ms / 1000.0
    print(f"{name:55s} {per_ms:9.2f} ms {mpix:8.3f} Mpix/s", flush=True)
    return per_ms, mpix


def main():
    np.asarray(jnp.ones((8, 8)))  # tunnel warm-up
    from tpuir.models.restormer import Restormer
    from tpuir.models import restormer_fused
    from tpuir.models.mair import MaIR

    rest = Restormer()
    rp = rest.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    fused = restormer_fused.make_apply_fn(ln_bias=True)

    which = set(sys.argv[1:]) or {"all"}

    def want(tag):
        return "all" in which or tag in which

    if want("rb"):  # restormer bf16/unfused scaling
        bench("restormer unfused bf16-default b=1 @256", rest.apply, rp, 1, 256, 3, "bfloat16", None)
        bench("restormer unfused bf16-default b=8 @256", rest.apply, rp, 8, 256, 3, "bfloat16", None)
        bench("restormer unfused f32-HIGHEST b=8 @256", rest.apply, rp, 8, 256, 3, "float32", "float32")
    if want("rf"):  # fused batch scaling
        bench("restormer fused f32 b=8 @256", fused, rp, 8, 256, 3, "float32", "float32")
    if want("mair"):
        mair = MaIR()
        mp = mair.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        bench("mair f32 b=4 @128", mair.apply, mp, 4, 128, 3, "float32", "float32")
        bench("mair bf16-default b=1 @128", mair.apply, mp, 1, 128, 3, "bfloat16", None)
        bench("mair bf16-default b=4 @128", mair.apply, mp, 4, 128, 3, "bfloat16", None)


if __name__ == "__main__":
    main()
