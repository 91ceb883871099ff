#!/usr/bin/env python
"""Round-2 exploration part 2: MaIR component breakdown + fused-bf16 Restormer."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timeit(name, fn, *args, iters=10):
    """First positional arg is chained through the loop (a tiny
    data-dependent perturbation) so XLA cannot hoist the loop-invariant
    computation out of the fori_loop."""

    @jax.jit
    def loop(x0, *rest):
        def body(i, carry):
            acc, x = carry
            y = fn(x, *rest)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, x + (m * 1e-20).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body, (0.0, x0))[0]

    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:55s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    np.asarray(jnp.ones((8, 8)))
    which = set(sys.argv[1:]) or {"all"}
    rng = np.random.RandomState(0)

    if "all" in which or "rest" in which:
        from tpuir.models.restormer import Restormer
        from tpuir.models import restormer_fused

        rest = Restormer()
        rp = rest.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        x = jnp.asarray(rng.rand(1, 256, 256, 3), jnp.float32)
        fused_bf16 = restormer_fused.make_apply_fn(ln_bias=True, mm_bf16=True)
        timeit("restormer fused mm_bf16 b=1 @256",
               lambda q, p: fused_bf16(p, q), x, rp)
        x8 = jnp.asarray(rng.rand(8, 256, 256, 3), jnp.float32)
        timeit("restormer fused mm_bf16 b=8 @256",
               lambda q, p: fused_bf16(p, q), x8, rp)
        fused_f32 = restormer_fused.make_apply_fn(ln_bias=True)
        timeit("restormer fused f32 b=1 @256 (recheck)",
               lambda q, p: fused_f32(p, q), x, rp)

    if "all" in which or "mair" in which:
        from tpuir.models.mair import MaIR
        from tpuir.ops.scan_pallas import selective_scan_fused_proj

        # CDN released size
        B, K, L, D, N, R = 1, 4, 128 * 128, 234, 16, 12
        xs = jnp.asarray(rng.rand(B, K, L, D), jnp.float32)
        wxp = jnp.asarray(rng.rand(K, R + 2 * N, D) * 0.02, jnp.float32)
        wdt = jnp.asarray(rng.rand(K, D, R) * 0.02, jnp.float32)
        A = -jnp.exp(jnp.asarray(rng.rand(K, D, N), jnp.float32))
        Ds = jnp.ones((K, D), jnp.float32)
        db = jnp.zeros((K, D), jnp.float32)
        timeit(
            "fused scan alone (CDN: K4 L16384 D234)",
            lambda xs_: selective_scan_fused_proj(xs_, wxp, wdt, A, Ds, db, chunk=256),
            xs,
        )

        from tpuir.models.mair import scan_ids_for

        (sids, iids), _ = scan_ids_for(128, 128, 4)
        xf = jnp.asarray(rng.rand(B, L, D), jnp.float32)

        def gathers(xf_):
            xs_ = jnp.take(xf_, sids, axis=1)
            y = jnp.take_along_axis(xs_, iids[None, :, :, None], axis=2)
            return jnp.sum(y, axis=1)

        timeit("NSS gather+inverse+sum (K4 L16384 D234)", gathers, xf)

        mair = MaIR()
        mp = mair.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        xm = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
        # default matmul precision (bf16 passes) vs the parity f32 pin
        timeit("mair f32 default-precision b=1 @128",
               lambda q, p: mair.apply(p, q), xm, mp)


if __name__ == "__main__":
    main()
