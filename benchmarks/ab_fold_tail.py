"""A/B: phase-folded FPN tail (fold.py) vs the unfused up2+conv3x3 tail.

FPN-MobileNet@2048 and FPN-Inception@768 full-model serving forwards,
fold on vs off, same params. In-jit chained fori_loop timing.

Run: python benchmarks/ab_fold_tail.py
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

from tpuir.models.deblurgan import FPNInception, FPNMobileNet  # noqa: E402

ITERS = 20


def timeit(apply_fn, params, x):
    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            m = apply_fn(p, qq).mean()
            return acc + m, qq + (m * 1e-20).astype(qq.dtype)
        return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), q))[0]

    np.asarray(loop(params, x))
    best = min(
        (lambda t0: (np.asarray(loop(params, x)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(2)
    )
    return best / ITERS * 1e3


def main():
    rng = np.random.RandomState(0)
    for cls, px, label in [(FPNMobileNet, 2048, "MobileNet@2048"),
                           (FPNInception, 768, "Inception@768")]:
        x = jnp.asarray(rng.rand(1, px, px, 3).astype(np.float32) * 2 - 1)
        p = cls(fold_tail=False).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3), jnp.float32))
        ms_off = timeit(cls(fold_tail=False).apply, p, x)
        ms_on = timeit(cls(fold_tail=True).apply, p, x)
        y_off = cls(fold_tail=False).apply(p, x[:, :256, :256, :])
        y_on = cls(fold_tail=True).apply(p, x[:, :256, :256, :])
        d = float(jnp.abs(y_on - y_off).max())
        print(f"{label}: unfused {ms_off:.2f} ms -> folded {ms_on:.2f} ms "
              f"({ms_off / ms_on:.2f}x); max|delta|@256 = {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
