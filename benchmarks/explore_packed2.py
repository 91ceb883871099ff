"""Part 2 of the packed-conv exploration: the remaining unknowns before
committing the packed FPN-MobileNet serving path.

  * stride-2 packed dense dw @ the f2/f4 shapes vs direct
  * packed TrainNorm (stats over phases via a (..., f^2, C) view)
  * the two relayout seams the design needs: s2d2 of smoothed
    (1024^2, 32) before the packed tail, and d2s2 of (256^2, 96) after
    the packed f2 exit
  * f5/f6-style pw convs @256^2 x32 region, direct vs packed

Run on the TPU: python benchmarks/explore_packed2.py
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

from jax import lax  # noqa: E402

from tpuir.models.deblurgan import fold as F  # noqa: E402

N_LO, N_HI = 100, 400


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


def conv(x, k, stride=1):
    p = ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2)
    return lax.conv_general_dilated(
        x, k, (stride, stride), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def report(name, ms):
    print(f"  {name:56s}: {ms:8.3f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    rj = jax.random.PRNGKey(0)

    # --- stride-2 dw: f2 (96ch @1024^2 -> 512^2), f4 (144 @512 -> 256)
    for (hw, c) in ((1024, 96), (512, 144)):
        kd = jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32) * 0.1)

        def dws2(a, kk=kd, cc=c):
            return lax.conv_general_dilated(
                a, kk, (2, 2), ((1, 1), (1, 1)), feature_group_count=cc,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        q = jax.random.normal(rj, (1, hw, hw, c), jnp.float32)
        report(f"dw s2 direct x{c} @{hw}", timeit(dws2, q))

        def m(xp, cc=c):
            return F.space_to_depth(dws2(F.depth_to_space(xp, 2, cc)), 2)

        pk = F.derive_packed_kernel_strided(m, 4 * c, 3, 2)
        qp = F.space_to_depth(q, 2)
        report(f"dw s2 packed dense {4*c}->{4*c} @{hw//2} (pre-packed)",
               timeit(lambda a, b: conv(a, b, stride=2), qp, pk))

    # --- packed TrainNorm: (512^2,128) phases=4 c=32 vs direct @1024^2x32
    q = jax.random.normal(rj, (1, 1024, 1024, 32), jnp.float32)

    def tn_direct(a):
        mu = jnp.mean(a, axis=(1, 2), keepdims=True)
        var = jnp.mean((a - mu) ** 2, axis=(1, 2), keepdims=True)
        return (a - mu) * jax.lax.rsqrt(var + 1e-5)

    report("TrainNorm direct @1024^2 x32", timeit(tn_direct, q))
    qp = F.space_to_depth(q, 2)

    def tn_packed(a):
        n, h, w, pc = a.shape
        x5 = a.reshape(n, h, w, 4, pc // 4)
        mu = jnp.mean(x5, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean((x5 - mu) ** 2, axis=(1, 2, 3), keepdims=True)
        return ((x5 - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(a.shape)

    report("TrainNorm packed phases=4 @512^2 x128", timeit(tn_packed, qp))

    # --- relayout seams
    report("s2d2 (1024^2,32)->(512^2,128) standalone",
           timeit(lambda a: F.space_to_depth(a, 2), q))
    q96 = jax.random.normal(rj, (1, 256, 256, 96), jnp.float32)
    report("d2s2 (256^2,96)->(512^2,24) standalone",
           timeit(lambda a: F.depth_to_space(a, 2, 24), q96))

    # --- seam fused with a conv: packed pw then unpack
    kp = jnp.asarray(rng.randn(1, 1, 384, 96).astype(np.float32) * 0.1)
    q384 = jax.random.normal(rj, (1, 256, 256, 384), jnp.float32)
    report("pw packed 384->96 @256 then d2s2 (fused seam)",
           timeit(lambda a, b: F.depth_to_space(conv(a, b), 2, 24), q384, kp))

    # --- the f5/f6 region @256^2 x32 (pw expand 32->192, dw, pw 192->32)
    k1 = jnp.asarray(rng.randn(1, 1, 32, 192).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, 1, 192).astype(np.float32) * 0.1)
    k3 = jnp.asarray(rng.randn(1, 1, 192, 32).astype(np.float32) * 0.1)
    q32 = jax.random.normal(rj, (1, 256, 256, 32), jnp.float32)

    def f56(a):
        h = conv(a, k1)
        h = lax.conv_general_dilated(
            h, k2, (1, 1), ((1, 1), (1, 1)), feature_group_count=192,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return conv(h, k3)

    report("f5-style block direct @256^2 x32", timeit(f56, q32))

    # --- full entry+f1+f2 packed chain (the committed plan) vs direct
    # entry 48->128, bn, f1 dw 128, pw 128->64, f2 pw 64->384, dw s2
    # 384 stride2, pw 384->96, d2s -> (512^2,24)
    ke = jnp.asarray(rng.randn(3, 3, 48, 128).astype(np.float32) * 0.05)
    kdw1 = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    kpw1 = jnp.asarray(rng.randn(1, 1, 128, 64).astype(np.float32) * 0.05)
    kpw2 = jnp.asarray(rng.randn(1, 1, 64, 384).astype(np.float32) * 0.05)
    kdw2 = jnp.asarray(rng.randn(3, 3, 384, 384).astype(np.float32) * 0.05)
    kpw3 = jnp.asarray(rng.randn(1, 1, 384, 96).astype(np.float32) * 0.05)
    x4 = jax.random.normal(rj, (1, 512, 512, 48), jnp.float32)

    def packed_chain(a):
        h = tn_packed(conv(a, ke))
        h = jnp.clip(h, 0, 6)
        h = jnp.clip(tn_packed(conv(h, kdw1)), 0, 6)
        h = tn_packed(conv(h, kpw1))
        h = jnp.clip(tn_packed(conv(h, kpw2)), 0, 6)
        h = jnp.clip(tn_packed(conv(h, kdw2, stride=2)), 0, 6)
        h = tn_packed(conv(h, kpw3))
        return F.depth_to_space(h, 2, 24)

    report("packed entry..f2 chain @512 in, (512^2,24) out",
           timeit(packed_chain, x4))


if __name__ == "__main__":
    main()
