"""A/B: FPN-Inception packed tail vs plain tail @768 (harness shape).

Run on the TPU: python benchmarks/ab_inception_tail.py
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

from tpuir.models.deblurgan import FPNInception  # noqa: E402

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
    plain = FPNInception()
    packed = FPNInception(packed_tail=True)
    p = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3), jnp.float32))
    x = jnp.asarray(rng.rand(1, 768, 768, 3).astype(np.float32) * 2 - 1)
    ms0 = timeit(plain.apply, p, x)
    ms1 = timeit(packed.apply, p, x)
    print(f"Inception@768: plain {ms0:.2f} ms ({768*768/ms0/1e3:.1f} Mpix/s) -> "
          f"packed tail {ms1:.2f} ms ({768*768/ms1/1e3:.1f} Mpix/s); "
          f"{ms0/ms1:.2f}x", flush=True)
    xs = x[:, :256, :256, :]
    with jax.default_matmul_precision("float32"):
        d = float(jnp.abs(plain.apply(p, xs) - packed.apply(p, xs)).max())
    print(f"f32-pinned max|delta|@256 = {d:.2e}")


if __name__ == "__main__":
    main()
