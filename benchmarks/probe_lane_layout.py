"""Probe: does lane padding of small-C NHWC tensors explain the FPN tail?

TPU HBM arrays are tiled (8 sublanes x 128 lanes) on the last two dims,
so a (N,H,W,3) f32 tensor occupies 128/3 = 42x its logical bytes and a
(N,H,W,32) tensor 4x. Hypothesis from micro_mobilenet.py: every op in
FPN-MobileNet runs at ~HBM roofline x its lane-padding waste, which is
why the phase-folded tail (fold.py) measured perf-neutral in-model — the
elementwise tanh/skip/clip passes at 2048^2 x3 dominate either way.

Timings use the two-trip-count difference method (micro_mobilenet.py) to
cancel the ~28 ms tunnel dispatch latency.

Run: python benchmarks/probe_lane_layout.py
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

from tpuir.models.deblurgan.fold import depth_to_space2, fold_up2_kernel  # noqa: E402

N_LO, N_HI = 100, 600
HBM_GBPS = 700.0


def timeit(fn, *args):
    @jax.jit
    def loop(n, a0, rest):
        def body(i, carry):
            acc, q = carry
            m = fn(q, *rest)
            m = m.mean() if m.ndim else m
            return acc + m.astype(jnp.float32), q + (m * 1e-20).astype(q.dtype)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), a0))[0]

    a0, rest = args[0], args[1:]
    np.asarray(loop(N_LO, a0, rest))

    def run(n):
        t0 = time.perf_counter()
        np.asarray(loop(n, a0, rest))
        return time.perf_counter() - t0

    lo, hi = min(run(N_LO) for _ in range(2)), min(run(N_HI) for _ in range(2))
    return (hi - lo) / (N_HI - N_LO) * 1e3


def roofline_ms(*shapes):
    b = sum(int(np.prod(s)) for s in shapes) * 4
    return b / (HBM_GBPS * 1e9) * 1e3


def report(name, ms, ref):
    print(f"  {name:44s}: {ms:7.3f} ms (roofline {ref:6.3f}, {ms / ref:5.1f}x)",
          flush=True)


def main():
    rng = jax.random.PRNGKey(0)

    # --- pure elementwise pass, same logical bytes, different last dim
    for shape in [(1, 2048, 2048, 3), (1, 3, 2048, 2048), (1, 1024, 1024, 12),
                  (1, 2048, 2048, 128), (1, 1024, 1024, 48)]:
        a = jax.random.normal(rng, shape, jnp.float32)
        ms = timeit(lambda q: jnp.clip(jnp.tanh(q) + q, -1.0, 1.0), a)
        report(f"tanh+add+clip {shape}", ms, roofline_ms(shape, shape))

    # --- the production (unfused) tail at 2048: up2 + conv + tanh + skip
    sm = jax.random.normal(rng, (1, 1024, 1024, 32), jnp.float32)
    x = jax.random.normal(rng, (1, 2048, 2048, 3), jnp.float32)
    k = jax.random.normal(rng, (3, 3, 32, 3), jnp.float32) * 0.1
    b = jnp.zeros((3,), jnp.float32)

    def unfused(q, kk, bb, ii):
        up = jnp.repeat(jnp.repeat(q, 2, axis=1), 2, axis=2)
        y = jax.lax.conv_general_dilated(
            up, kk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bb
        return jnp.clip(jnp.tanh(y) + ii, -1.0, 1.0)

    report("tail unfused @2048", timeit(unfused, sm, k, b, x),
           roofline_ms((1024, 1024, 32), (2048, 2048, 3), (2048, 2048, 3)))

    # --- folded tail, d2s before the elementwise ops (fold.py as shipped)
    def folded(q, kk, bb, ii):
        w4 = fold_up2_kernel(kk)
        y4 = jax.lax.conv_general_dilated(
            q, w4, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = depth_to_space2(y4, 3) + bb
        return jnp.clip(jnp.tanh(y) + ii, -1.0, 1.0)

    report("tail folded, d2s-early @2048", timeit(folded, sm, k, b, x),
           roofline_ms((1024, 1024, 32), (2048, 2048, 3), (2048, 2048, 3)))

    # --- phase-domain tail: s2d the skip once, ALL elementwise at 1024^2x12,
    #     one d2s at the very end
    def s2d(t):  # (N,2H,2W,C) -> (N,H,W,4C), phase order (di,dj,c)
        n, h2, w2, c = t.shape
        t = t.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 // 2, w2 // 2, 4 * c)

    def phase_tail(q, kk, bb, ii):
        w4 = fold_up2_kernel(kk)
        y4 = jax.lax.conv_general_dilated(
            q, w4, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x4 = s2d(ii)
        out4 = jnp.clip(jnp.tanh(y4 + jnp.tile(bb, 4)) + x4, -1.0, 1.0)
        return depth_to_space2(out4, 3)

    report("tail folded, phase-domain @2048", timeit(phase_tail, sm, k, b, x),
           roofline_ms((1024, 1024, 32), (2048, 2048, 3), (2048, 2048, 3)))

    # --- d2s / s2d alone
    y4 = jax.random.normal(rng, (1, 1024, 1024, 12), jnp.float32)
    report("d2s (1024^2x12 -> 2048^2x3)", timeit(lambda q: depth_to_space2(q, 3), y4),
           roofline_ms((1024, 1024, 12), (1024, 1024, 12)))
    report("s2d (2048^2x3 -> 1024^2x12)", timeit(s2d, x),
           roofline_ms((2048, 2048, 3), (2048, 2048, 3)))


if __name__ == "__main__":
    main()
