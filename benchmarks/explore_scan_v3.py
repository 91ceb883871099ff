#!/usr/bin/env python
"""Scan kernel isolation: current fused kernel at MaIR dims, chunk sweep."""
import os, sys, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import jax, jax.numpy as jnp, numpy as np
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
    from tpuir.ops.scan_pallas import selective_scan_fused_proj
    rng = np.random.RandomState(0)
    b, k, L, d, n = 1, 4, 128 * 128, 234, 16
    r = 15  # ceil(180/16) for MaIR
    xs = jnp.asarray(rng.randn(b, k, L, d) * 0.1, jnp.float32)
    wxp = jnp.asarray(rng.randn(k, r + 2 * n, d) * 0.05, jnp.float32)
    wdt = jnp.asarray(rng.randn(k, d, r) * 0.05, jnp.float32)
    A = jnp.asarray(-np.exp(rng.randn(k, d, n) * 0.3), jnp.float32)
    D = jnp.asarray(rng.randn(k, d), jnp.float32)
    bias = jnp.asarray(rng.randn(k, d) * 0.1, jnp.float32)
    cases = [(256, False, "vert", 16), (256, False, "vert", 8),
             (256, False, "vert", 32), (256, False, "vert", 64),
             (512, False, "vert", 32), (256, True, "vert", 32)]
    for chunk, serving, algo, P in cases:
        timeit(
            f"fused_proj chunk={chunk} serving={serving} {algo} P={P}",
            lambda x, *w, c=chunk, s=serving, a=algo, p=P:
                selective_scan_fused_proj(x, *w, chunk=c, serving=s, algo=a,
                                          vert_p=p),
            xs, wxp, wdt, A, D, bias,
        )

if __name__ == "__main__":
    main()
