"""VPU / MXU micro-roofline for the hot kernels (round 4).

Measures, on the real chip:

  * elementwise VPU THROUGHPUT per op class (mul / fma / exp2), via a
    Pallas kernel holding 8 independent register streams in VMEM — an
    XLA-level dependent chain measures op latency (~20 Gelem/s) and an
    XLA-level interleaved chain is fusion/traffic-bound (~80 Gelem/s);
    only a register-resident unrolled loop shows the issue rate
    (~660-790 Gelem/s) the scan kernel actually competes against;
  * the bf16 MXU matmul peak (8192^3) — the PEAK_FLOPS denominator used
    by scripts/benchmark_all.py and bench.py's speed-of-light rows;
  * the standalone nss_scan_stripe time at the MaIR-CDN serving shape,
    against its arithmetic floor from the measured VPU rates.

The stripe kernel's recurrence is elementwise VPU work over
(K=4, L, n, Dp). Per element (nss_stripe.py scan_dir, f32 path):
  av = exp2(dt*A)      1 mul + 1 exp2
  bv = B*du            1 mul
  hA = av*hA           1 mul
  hB = av*hB + bv      1 fma
  h  = HA*CE + HB      1 fma (level-2 correction)
  y += h*C             1 fma (n-accumulation)
-> 3 mul + 3 fma + 1 exp2. If measured ~= floor, the remaining MaIR gap
is chip physics (VPU elementwise throughput), not kernel engineering —
the driver-verifiable form of the docs/STATUS.md argument.

Run on the real TPU: python benchmarks/micro_vpu.py
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

ITERS = 10
ROUNDS, STREAMS = 32, 8   # unrolled rounds x independent register streams
BLK = (512, 128)          # f32 block per stream (VMEM-resident)


def _probe_kernel(op, x_ref, o_ref):
    a = [x_ref[i] * (1.0 + 1e-6 * i) for i in range(STREAMS)]
    for _ in range(ROUNDS):
        a = [op(v) for v in a]
    acc = a[0]
    for v in a[1:]:
        acc = acc + v
    o_ref[...] = acc


def vpu_rate(name, op, grid=256):
    """Per-op elementwise throughput (Gelem/s), register-resident."""
    x = jnp.full((STREAMS,) + BLK, 0.7, jnp.float32)
    f = pl.pallas_call(
        functools.partial(_probe_kernel, op),
        grid=(grid,),
        in_specs=[pl.BlockSpec((STREAMS,) + BLK, lambda g: (0, 0, 0))],
        out_specs=pl.BlockSpec(BLK, lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(BLK, jnp.float32),
    )
    jf = jax.jit(lambda x: f(x).mean())
    loop = jax.jit(lambda x: jax.lax.fori_loop(
        0, ITERS, lambda i, c: c + jf(x + c * 1e-30), 0.0))
    np.asarray(loop(x))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(loop(x))
    dt = (time.perf_counter() - t0) / ITERS
    rate = STREAMS * BLK[0] * BLK[1] * ROUNDS * grid / dt / 1e9
    print(f"{name:44s} {rate:9.1f} Gelem/s  ({dt*1e3:7.3f} ms/loop)")
    return rate


def matmul_peak(n=8192, dtype=jnp.bfloat16, iters=30):
    """Sustained big-matmul TFLOP/s — the MFU denominator."""
    a = jnp.ones((n, n), dtype)
    b = jnp.ones((n, n), dtype)

    def body(i, c):
        return c + jnp.mean((a * (1 + c * 1e-30)) @ b).astype(jnp.float32)

    loop = jax.jit(lambda: jax.lax.fori_loop(0, iters, body, 0.0))
    np.asarray(loop())
    t0 = time.perf_counter()
    np.asarray(loop())
    dt = (time.perf_counter() - t0) / iters
    tf = 2 * n**3 / dt / 1e12
    print(f"{'bf16 matmul peak (8192^3)':44s} {tf:9.1f} TFLOP/s "
          f"({dt*1e3:7.3f} ms)")
    return tf


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    r_mul = vpu_rate("pallas f32 mul throughput (x*0.99)",
                     lambda v: v * 0.99)
    r_fma = vpu_rate("pallas f32 fma throughput (0.5*x+0.3)",
                     lambda v: 0.5 * v + 0.3)
    r_exp2 = vpu_rate("pallas f32 exp2 throughput",
                      lambda v: jnp.exp2(-v))
    peak_tf = matmul_peak()

    # ---- scan arithmetic floor at the MaIR-CDN serving shape ----
    H = W = 128
    d_model, expand, N = 180, 1.3, 16
    d = int(expand * d_model)          # 234
    R = math.ceil(d_model / 16)        # 12
    Dp = ((d + 127) // 128) * 128      # 256 (lane padding the kernel pays)
    K, L = 4, H * W
    elems = K * L * N * Dp             # recurrence elements
    # per-element op mix from the kernel (module docstring): 3 mul +
    # 3 fma + 1 exp2. HA/HB VMEM stores and per-(L,Dp) prologue work
    # (softplus dt, projections) are excluded — the floor is optimistic.
    floor_ms = elems * (3 / r_mul + 3 / r_fma + 1 / r_exp2) / 1e6
    print(f"\nscan call @CDN 128^2 serving: {elems/1e6:.0f}M recurrence "
          f"elements (Dp={Dp} incl. lane pad)")
    print(f"  arithmetic floor from measured rates: {floor_ms:7.2f} ms "
          f"(mul {3*elems/r_mul/1e6:.2f} + fma {3*elems/r_fma/1e6:.2f} "
          f"+ exp2 {elems/r_exp2/1e6:.2f})")

    # ---- measured standalone stripe kernel at the same shape ----
    from tpuir.ops.nss_stripe import nss_scan_stripe

    rng = np.random.RandomState(0)
    xin = jnp.asarray(rng.rand(1, H, W, d), jnp.float32)
    wxp = jnp.asarray(rng.randn(K, R + 2 * N, d) * 0.05, jnp.float32)
    wdt = jnp.asarray(rng.randn(K, d, R) * 0.05, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.randn(K, d, N) * 0.1, jnp.float32))
    Dd = jnp.asarray(rng.rand(K, d), jnp.float32)
    db = jnp.asarray(rng.randn(K, d) * 0.1, jnp.float32)

    def call(x, serving=True):
        o = nss_scan_stripe(x, wxp, wdt, A, Dd, db, scan_len=4,
                            serving=serving)
        return o[0].astype(jnp.float32).mean() + o[4].mean()

    def meas(name, fn, iters=30):
        loop = jax.jit(lambda x: jax.lax.fori_loop(
            0, iters, lambda i, c: c + fn(x + c * 1e-20), 0.0))
        np.asarray(loop(xin))
        t0 = time.perf_counter()
        np.asarray(loop(xin))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:44s} {ms:9.2f} ms")
        return ms

    ms_srv = meas("nss_scan_stripe @128 CDN serving", call)
    print(f"\nmeasured / floor = {ms_srv / floor_ms:.2f}x"
          f"  -> per-forward scan core ~= 36 mixers * {ms_srv:.2f} ms"
          f" = {36 * ms_srv:.0f} ms vs floor {36 * floor_ms:.0f} ms")
    out = {
        "mul_gelem_s": round(r_mul, 1),
        "fma_gelem_s": round(r_fma, 1),
        "exp2_gelem_s": round(r_exp2, 1),
        "bf16_matmul_peak_tflops": round(peak_tf, 1),
        "scan_floor_ms": round(floor_ms, 2),
        "scan_measured_ms": round(ms_srv, 2),
        "measured_over_floor": round(ms_srv / floor_ms, 2),
    }
    import json
    with open(os.path.join(os.path.dirname(__file__), "micro_vpu.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print("written benchmarks/micro_vpu.json")


if __name__ == "__main__":
    main()
