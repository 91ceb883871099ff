"""A/B: phase-packed FPN-MobileNet serving path vs the plain forward.

Full-model @2048 (the harness shape) and @1024, bare forward in an
in-jit chained fori_loop, default (serving) matmul precision, shared
params. Also reports the numeric delta at 256 under f32-pinned precision
(the exactness bound; uint8 LSB = 7.8e-3 in the [-1,1] range).

Run on the TPU: python benchmarks/ab_phase_io.py
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

from tpuir.models.deblurgan.fpn_mobilenet import FPNMobileNet  # noqa: E402
from tpuir.models.deblurgan.fold import depth_to_space, space_to_depth  # noqa: E402

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
    plain = FPNMobileNet()
    phase = FPNMobileNet(phase_io=True)
    p = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3), jnp.float32))

    for px in (2048, 1024):
        x = jnp.asarray(rng.rand(1, px, px, 3).astype(np.float32) * 2 - 1)
        x16 = space_to_depth(x, 4)
        ms_plain = timeit(plain.apply, p, x)
        ms_phase = timeit(phase.apply, p, x16)
        mp_plain = px * px / ms_plain / 1e3
        mp_phase = px * px / ms_phase / 1e3
        print(f"@{px}: plain {ms_plain:.2f} ms ({mp_plain:.1f} Mpix/s) -> "
              f"phase-packed {ms_phase:.2f} ms ({mp_phase:.1f} Mpix/s); "
              f"{ms_plain / ms_phase:.2f}x", flush=True)

    xs = jnp.asarray(rng.rand(1, 256, 256, 3).astype(np.float32) * 2 - 1)
    with jax.default_matmul_precision("float32"):
        y0 = plain.apply(p, xs)
        y1 = depth_to_space(phase.apply(p, space_to_depth(xs, 4)), 4, 3)
    print(f"f32-pinned max|delta|@256 = {float(jnp.abs(y0 - y1).max()):.2e}")
    y0 = plain.apply(p, xs)
    y1 = depth_to_space(phase.apply(p, space_to_depth(xs, 4)), 4, 3)
    print(f"serving-precision max|delta|@256 = {float(jnp.abs(y0 - y1).max()):.2e}")


if __name__ == "__main__":
    main()
