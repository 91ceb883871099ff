"""Micro-op timing for the FPN-MobileNet@2048 serving path.

The stage decomposition (explore_mobilenet.py) shows backbone 28 ms /
FPN glue 7 / smooth2 9 / tail 14.4 of 58.8 ms at 13% MFU — this script
times the constituent ops at their production shapes to find which
primitive is off its roofline: XLA depthwise conv, TrainNorm (two-pass
spatial moments), nearest upsample (jnp.repeat), the C_out=3 final conv,
or the pointwise MXU convs.

Each op runs in an in-jit chained fori_loop (the only reliable timing
under the async tunnel dispatch). The tunnel's dispatch+fetch round trip
is ~25-30 ms — larger than any micro op — so per-op time is taken as the
DIFFERENCE between a 600-iteration and a 100-iteration run of the same
compiled program (trip count is a traced argument), which cancels the
fixed latency exactly. Roofline ms = f32 bytes moved once (read in +
write out) at 700 GB/s sustained HBM.

Run: python benchmarks/micro_mobilenet.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from tpuir.models.deblurgan.norms import TrainNorm, upsample_nearest  # noqa: E402

N_LO, N_HI = 100, 600
HBM_GBPS = 700.0


def timeit(fn, *args):
    @jax.jit
    def loop(n, a0, rest):
        def body(i, carry):
            acc, q = carry
            m = fn(q, *rest)
            m = m.mean() if m.ndim else m
            return acc + m, q + (m * 1e-20).astype(q.dtype)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), a0))[0]

    a0, rest = args[0], args[1:]
    np.asarray(loop(N_LO, a0, rest))  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        np.asarray(loop(n, a0, rest))
        return time.perf_counter() - t0

    lo, hi = min(run(N_LO) for _ in range(2)), min(run(N_HI) for _ in range(2))
    return (hi - lo) / (N_HI - N_LO) * 1e3


def roofline_ms(*tensors):
    b = sum(int(np.prod(t)) for t in tensors) * 4
    return b / (HBM_GBPS * 1e9) * 1e3


def report(name, ms, ref_ms):
    print(f"  {name:42s}: {ms:7.3f} ms  (roofline {ref_ms:6.3f}, {ms / ref_ms:5.1f}x)",
          flush=True)


def main():
    rng = jax.random.PRNGKey(0)

    # --- depthwise 3x3 at backbone shapes (stride 1)
    for (h, c) in [(1024, 32), (512, 96), (512, 144), (256, 192), (128, 384), (64, 960)]:
        x = jax.random.normal(rng, (1, h, h, c), jnp.float32)
        m = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, use_bias=False)
        p = m.init(rng, x)
        ms = timeit(lambda q, pp: m.apply(pp, q), x, p)
        report(f"dw3x3 @{h}^2 x{c}", ms, roofline_ms((h, h, c), (h, h, c)))

    # --- pointwise (1x1) MXU convs at expand shapes
    for (h, ci, co) in [(1024, 32, 16), (512, 24, 144), (512, 144, 24), (128, 64, 384)]:
        x = jax.random.normal(rng, (1, h, h, ci), jnp.float32)
        m = nn.Conv(co, (1, 1), use_bias=False)
        p = m.init(rng, x)
        ms = timeit(lambda q, pp: m.apply(pp, q), x, p)
        report(f"pw1x1 @{h}^2 {ci}->{co}", ms, roofline_ms((h, h, ci), (h, h, co)))

    # --- TrainNorm (two-pass moments + normalize) at hot shapes
    for (h, c) in [(1024, 32), (512, 144), (256, 192), (1024, 64)]:
        x = jax.random.normal(rng, (1, h, h, c), jnp.float32)
        m = TrainNorm(c, affine=True)
        p = m.init(rng, x)
        ms = timeit(lambda q, pp: m.apply(pp, q), x, p)
        # ideal: one read for fused stats + one read + one write to normalize
        report(f"TrainNorm @{h}^2 x{c}", ms, roofline_ms((h, h, c)) * 3)

    # --- nearest upsample x2 (jnp.repeat) at the tail shapes
    for (h, c) in [(512, 64), (1024, 32)]:
        x = jax.random.normal(rng, (1, h, h, c), jnp.float32)
        ms = timeit(lambda q: upsample_nearest(q, 2), x)
        report(f"upsample2x @{h}^2 x{c}", ms, roofline_ms((h, h, c), (2 * h, 2 * h, c)))

    # --- final conv 3x3 32->3 @2048^2 (C_out=3: 3/128 lane fill)
    x = jax.random.normal(rng, (1, 2048, 2048, 32), jnp.float32)
    m = nn.Conv(3, (3, 3), padding=1)
    p = m.init(rng, x)
    ms = timeit(lambda q, pp: m.apply(pp, q), x, p)
    report("final conv3x3 32->3 @2048^2", ms, roofline_ms((2048, 2048, 32), (2048, 2048, 3)))

    # --- tail composite: upsample + final conv + tanh + skip + clip
    xs = jax.random.normal(rng, (1, 1024, 1024, 32), jnp.float32)
    inp = jax.random.normal(rng, (1, 2048, 2048, 3), jnp.float32)

    def tail(q, pp, ii):
        u = upsample_nearest(q, 2)
        f = m.apply(pp, u)
        return jnp.clip(jnp.tanh(f) + ii, -1.0, 1.0)

    ms = timeit(lambda q, pp, ii: tail(q, pp, ii), xs, p, inp)
    report("tail: up2x+conv+tanh+skip @2048^2", ms,
           roofline_ms((1024, 1024, 32), (2048, 2048, 32) * 2, (2048, 2048, 3) * 2))

    # --- stride-2 dw (downsample) at the two stride-2 shapes
    for (h, c) in [(1024, 96), (512, 144)]:
        x = jax.random.normal(rng, (1, h, h, c), jnp.float32)
        m2 = nn.Conv(c, (3, 3), strides=2, padding=1, feature_group_count=c, use_bias=False)
        p2 = m2.init(rng, x)
        ms = timeit(lambda q, pp: m2.apply(pp, q), x, p2)
        report(f"dw3x3 s2 @{h}^2 x{c}", ms, roofline_ms((h, h, c), (h // 2, h // 2, c)))


if __name__ == "__main__":
    main()
