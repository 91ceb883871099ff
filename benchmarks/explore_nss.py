#!/usr/bin/env python
"""Measure the gather-fused NSS scan (round 3) on the real TPU.

Stages:
  correctness  — small MaIR forward, TPU fused vs CPU XLA path (f32)
  kernel       — isolated nss_scan_fused vs old gather+selective_scan_fused_proj
  model        — MaIR-CDN@128 parity/serving full forwards (the 55 ms target)

Run: python benchmarks/explore_nss.py [stage ...]
"""

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
    @jax.jit
    def loop(*a):
        def body(i, carry):
            acc, q = carry
            y = fn(q, *a[1:])
            m = jnp.mean(jnp.asarray(jax.tree_util.tree_leaves(y)[0],
                                     jnp.float32))
            return acc + m, q + (m * 1e-20).astype(q.dtype)

        return jax.lax.fori_loop(0, iters, body, (0.0, a[0]))[0]

    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:55s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    which = sys.argv[1:] or ["all"]
    np.asarray(jnp.ones((8, 8)))  # tunnel warm-up
    rng = np.random.RandomState(0)

    if "all" in which or "correctness" in which:
        from tpuir.models.mair import MaIR

        m = MaIR(embed_dim=32, depths=(2, 2), d_state=8, ssm_ratio=1.5)
        x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x)
        with jax.default_matmul_precision("float32"):
            # fresh lambdas: the env flag is read at TRACE time, so each
            # variant needs its own jit cache entry
            y_fused = np.asarray(jax.jit(lambda p, x: m.apply(p, x))(p, x))
            os.environ["TPUIR_FUSED"] = "0"  # XLA gather+scan path, same chip
            try:
                y_xla = np.asarray(jax.jit(lambda p, x: m.apply(p, x))(p, x))
            finally:
                del os.environ["TPUIR_FUSED"]
        d = np.abs(y_fused - y_xla).max()
        print(f"correctness small MaIR fused vs XLA (TPU, f32): max|d| = {d:.3e}",
              flush=True)
        assert d < 5e-4, d

    if "all" in which or "kernel" in which:
        from tpuir.ops.nss_fused import nss_scan_fused
        from tpuir.ops.scan_pallas import selective_scan_fused_proj
        from tpuir.ops.scan_ids import mair_scan_ids

        B, H, W, d, n = 1, 128, 128, 234, 16
        r = 12
        x = jnp.asarray(rng.randn(B, H, W, d), jnp.float32)
        wxp = jnp.asarray(rng.randn(4, r + 2 * n, d) * 0.1, jnp.float32)
        wdt = jnp.asarray(rng.randn(4, d, r) * 0.1, jnp.float32)
        A = -jnp.exp(jnp.asarray(rng.randn(4, d, n) * 0.1, jnp.float32))
        D = jnp.asarray(rng.randn(4, d), jnp.float32)
        bias = jnp.asarray(rng.randn(4, d) * 0.1, jnp.float32)
        ids, inv = mair_scan_ids(H, W, 4, 0)
        ids, inv = jnp.asarray(ids), jnp.asarray(inv)

        for serving in (False, True):
            tag = "serving" if serving else "parity"
            timeit(
                f"nss_scan_fused @128 ({tag})",
                lambda q, *a: nss_scan_fused(q, *a, serving=serving)[0],
                x, wxp, wdt, A, D, bias,
            )
            timeit(
                f"nss_scan_fused @128 shift ({tag})",
                lambda q, *a: nss_scan_fused(q, *a, shift=True,
                                             serving=serving)[0],
                x, wxp, wdt, A, D, bias,
            )

            io = jnp.bfloat16 if serving else jnp.float32

            def old_path(q, wxp, wdt, A, D, bias):
                xf = q.reshape(B, H * W, d).astype(io)
                xs = jnp.take(xf, ids, axis=1)
                y = selective_scan_fused_proj(xs, wxp, wdt, A, D, bias,
                                              chunk=256, serving=serving)
                y = y.astype(io)
                y = jnp.take_along_axis(y, inv[None, :, :, None], axis=2)
                return jnp.sum(y, axis=1)

            timeit(f"old gather+fused_proj+igather @128 ({tag})", old_path,
                   x, wxp, wdt, A, D, bias)

    if "all" in which or "model" in which:
        from tpuir.models.mair import MaIR

        x = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
        m32 = MaIR()
        p = m32.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

        def par(q, pp):
            with jax.default_matmul_precision("float32"):
                return m32.apply(pp, q)

        timeit("MaIR-CDN@128 parity (fused stripes)", par, x, p)
        msrv = MaIR(scan_io_dtype="bfloat16")
        timeit("MaIR-CDN@128 serving (fused stripes)",
               lambda q, pp: msrv.apply(pp, q), x, p)


if __name__ == "__main__":
    main()
