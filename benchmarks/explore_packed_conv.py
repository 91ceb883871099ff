"""Device A/B of phase-packed conv implementations for FPN-MobileNet.

probe_lane_layout.py showed the @2048 serving cost is NOT elementwise
lane padding (those passes are ~free) — it is the small-C convs
themselves: up2+conv3x3 32->3 runs ~14 ms (41x its logical roofline) and
the 2-fold variant is no better. Hypothesis: convs whose input/output
channel count is far below the 128-lane tile run at tile-fill efficiency
on the MXU path, so the fix is to PACK SPACE INTO CHANNELS around them
(fold.py space_to_depth / derive_packed_kernel — numerically exact) so
every conv sees >=48 channels.

Times each production-shaped stage in direct vs packed form.
Run on the TPU: python benchmarks/explore_packed_conv.py
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


def conv(x, k, stride=1, pad="same"):
    p = ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2) if pad == "same" else pad
    return lax.conv_general_dilated(
        x, k, (stride, stride), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def report(name, ms):
    print(f"  {name:52s}: {ms:8.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.RandomState(0)
    rj = jax.random.PRNGKey(0)

    # ---- tail: up2 + conv3x3 32->3 @2048 ------------------------------
    k_tail = jnp.asarray(rng.randn(3, 3, 32, 3).astype(np.float32) * 0.1)
    sm = jax.random.normal(rj, (1, 1024, 1024, 32), jnp.float32)

    def tail_direct(q, kk):
        up = jnp.repeat(jnp.repeat(q, 2, axis=1), 2, axis=2)
        return conv(up, kk)

    report("tail direct up2+conv 32->3 @2048", timeit(tail_direct, sm, k_tail))

    k_f2 = F.fold_up2_kernel(k_tail)
    report("tail fold2 conv 32->12 @1024", timeit(lambda q, kk: conv(q, kk), sm, k_f2))

    def tail_pack_map(xp):
        s = F.depth_to_space(xp, 2, 32)
        return F.space_to_depth(tail_direct(s, k_tail), 4)

    k_p4 = F.derive_packed_kernel(tail_pack_map, 128, 3)
    smp = F.space_to_depth(sm, 2)  # (1,512,512,128)
    report("tail pack4 conv 128->48 @512 (pre-packed in)",
           timeit(lambda q, kk: conv(q, kk), smp, k_p4))
    report("tail pack4 incl. s2d+d2s relayouts",
           timeit(lambda q, kk: F.depth_to_space(
               conv(F.space_to_depth(q, 2), kk), 4, 3), sm, k_p4))

    # ---- entry: conv3x3 s2 3->32 @2048 --------------------------------
    k_e = jnp.asarray(rng.randn(3, 3, 3, 32).astype(np.float32) * 0.1)
    x = jax.random.normal(rj, (1, 2048, 2048, 3), jnp.float32)
    report("entry direct conv s2 3->32 @2048",
           timeit(lambda q, kk: conv(q, kk, stride=2), x, k_e))

    def entry_pack_map(xp):
        xx = F.depth_to_space(xp, 4, 3)
        return F.space_to_depth(conv(xx, k_e, stride=2), 2)

    k_pe = F.derive_packed_kernel(entry_pack_map, 48, 3)
    xp4 = F.space_to_depth(x, 4)  # (1,512,512,48)
    report("entry pack conv 48->128 @512 (pre-packed in)",
           timeit(lambda q, kk: conv(q, kk), xp4, k_pe))
    report("entry pack incl. s2d + d2s to (1024^2,32)",
           timeit(lambda q, kk: F.depth_to_space(
               conv(F.space_to_depth(q, 4), kk), 2, 32), x, k_pe))

    # phase entry as wired in fpn_mobilenet (phase_io): (2,2,12,32)@1024
    k_pi = F.fold_s2_entry_kernel(k_e, "same")
    x2 = F.space_to_depth(x, 2)
    report("entry phase_io conv (2,2) 12->32 @1024",
           timeit(lambda q, kk: conv(q, kk, pad=((1, 0), (1, 0))), x2, k_pi))

    # ---- backbone pointwise convs @1024 -------------------------------
    for ci, co in ((32, 16), (16, 96)):
        kk = jnp.asarray(rng.randn(1, 1, ci, co).astype(np.float32) * 0.1)
        q = jax.random.normal(rj, (1, 1024, 1024, ci), jnp.float32)
        report(f"pw direct {ci}->{co} @1024",
               timeit(lambda a, b: conv(a, b), q, kk))
        kp = jnp.zeros((1, 1, 4 * ci, 4 * co), jnp.float32)
        for p in range(4):
            kp = kp.at[0, 0, p * ci:(p + 1) * ci, p * co:(p + 1) * co].set(kk[0, 0])
        qp = F.space_to_depth(q, 2)
        report(f"pw packed {4*ci}->{4*co} @512 (pre-packed)",
               timeit(lambda a, b: conv(a, b), qp, kp))

    # ---- depthwise 3x3 @1024 x32: direct vs packed grouped ------------
    kd = jnp.asarray(rng.randn(3, 3, 1, 32).astype(np.float32) * 0.1)
    q = jax.random.normal(rj, (1, 1024, 1024, 32), jnp.float32)

    def dw_direct(a, b):
        return lax.conv_general_dilated(
            a, b, (1, 1), ((1, 1), (1, 1)), feature_group_count=32,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("dw3x3 direct x32 @1024", timeit(dw_direct, q, kd))

    def dw_pack_map(xp):  # packed grouped: groups=32, 4 phases per group?
        s = F.depth_to_space(xp, 2, 32)
        return F.space_to_depth(dw_direct(s, kd), 2)

    # NOTE channel order: packed layout is phase-major (p, c); a grouped
    # conv needs channel-major (c, p). Use a dense packed kernel instead
    # (exactness over structure; MXU does not care about zeros).
    k_dwp = F.derive_packed_kernel(dw_pack_map, 128, 3)
    qp = F.space_to_depth(q, 2)
    report("dw3x3 packed dense 128->128 @512 (pre-packed)",
           timeit(lambda a, b: conv(a, b), qp, k_dwp))


if __name__ == "__main__":
    main()
