#!/usr/bin/env python
"""Benchmark: flagship throughput on one chip (Restormer + MaIR).

Prints one JSON line per flagship — the LAST line is the headline
Restormer number. Both run in the documented 'serving' precision mode
(bf16 MXU passes with float32 accumulation; deltas vs the parity path are
pinned by tests/test_serving_mode.py and scripts/validate_serving.py).

  * Restormer: fused Pallas blocks (mm_bf16, row_tile 16) at the harness
    patch size 256, engine batch regime (8 patches per step).
  * MaIR-CDN: fused-projection Pallas scan, bf16 scan IO, at the harness
    patch size 128.

Denominators (round 4, VERDICT r3 item 4): vs_baseline = Mpix/s over
4x the DERIVED A100 device throughput of the reference's own op stream
(benchmarks/a100_estimate.py -> benchmarks/a100_estimates.json; method
and the full table in BASELINE.md). Restormer ~2.88 Mpix/s, MaIR-CDN
~0.38 Mpix/s (the old 3.0/0.1 guesses are superseded; 0.1 was ~4x too
favorable to this build). Env overrides TPUIR_BENCH_A100_MPIXPS /
TPUIR_BENCH_A100_MAIR_MPIXPS remain.

Context fields per row (see BASELINE.md "What the derivation shows"):
  * vs_a100        — ours / 1x A100-device (per-chip ratio)
  * sol_fraction   — ours / this chip's flop speed-of-light for the
    model (XLA-counted FLOPs / the measured bf16 MXU peak, 164 TFLOP/s
    from benchmarks/micro_vpu.py's chained 8192^3 loop; round 4's
    45 TF/s figure was dispatch-latency-polluted and is retired).
    Per resource, one v5e vs one A100-80GB: MXU 164 vs ~70 TF/s
    effective (v5e ahead), HBM 0.7 vs 1.6 TB/s (A100 2.3x), f32
    elementwise VPU ~0.6 vs ~9.7 Tfma/s (A100 ~16x). So the 4x-A100
    target is silicon-barred only for VPU/HBM-bound families (MaIR's
    scan, MobileNet's lane-padded streams); for the matmul-bound
    families sol_fraction shows honest software headroom.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the tunneled remote compiler takes minutes for
# the fused model, the cache makes repeat bench runs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def measure(apply_fn, params, x, iters, pin_f32=False):
    # The tunneled TPU backend dispatches asynchronously (block_until_ready
    # does not truly sync) and adds per-dispatch latency, so the iteration
    # loop runs inside ONE jitted program: each iteration's input chains on
    # the previous mean (defeats loop-invariant hoisting), and only a
    # scalar is fetched.
    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            if pin_f32:
                with jax.default_matmul_precision("float32"):
                    y = apply_fn(p, qq)
            else:
                y = apply_fn(p, qq)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, qq + (m * 1e-20).astype(qq.dtype)

        return jax.lax.fori_loop(0, iters, body, (0.0, q))[0]

    np.asarray(loop(params, x))  # compile + first run
    t0 = time.perf_counter()
    np.asarray(loop(params, x))
    dt = time.perf_counter() - t0
    return x.shape[0] * x.shape[1] * x.shape[2] * iters / dt / 1e6


def _measured_peak():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "micro_vpu.json")
    try:
        return json.load(open(path))["bf16_matmul_peak_tflops"] * 1e12
    except Exception:
        return 164e12


_PEAK = _measured_peak()


def _a100_estimates():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "a100_estimates.json")
    try:
        return json.load(open(path))["results"]
    except Exception:
        return {}


def main():
    iters = int(os.environ.get("TPUIR_BENCH_ITERS", "10"))
    np.asarray(jnp.ones((8, 8)))  # tunnel warm-up (first contact is ~2 min)
    rng = np.random.RandomState(0)

    # --- MaIR-CDN @128 (serving) ------------------------------------------
    from tpuir.models.mair import MaIR

    mair = MaIR(scan_io_dtype="bfloat16")
    mp = mair.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    xm = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
    mair_mpix = measure(mair.apply, mp, xm, iters)
    est = _a100_estimates()
    a100_mair = float(os.environ.get(
        "TPUIR_BENCH_A100_MAIR_MPIXPS",
        est.get("MaIR-CDN@128", {}).get("a100_device_mpix_per_s", 0.379),
    ))
    # v5e flop SoL: XLA-counted 1572 GFLOP @256 (scripts/compute_flops.py)
    # -> 393 GFLOP @128 over the measured 164 TFLOP/s bf16 peak
    # (micro_vpu.json). The scan executes on the VPU (measured ~0.6-0.8
    # Tops/s per op class), not the MXU, so this flop ceiling is
    # structurally unreachable for MaIR — the binding ceiling is the
    # measured VPU arithmetic floor (micro_vpu.json measured/floor=0.82).
    mair_sol = 128 * 128 / (393.1e9 / _PEAK) / 1e6
    print(
        json.dumps(
            {
                "metric": "mair_cdn_serving_128px_throughput",
                "value": round(mair_mpix, 3),
                "unit": "Mpix/s/chip",
                "vs_baseline": round(mair_mpix / (4.0 * a100_mair), 3),
                "vs_a100": round(mair_mpix / a100_mair, 3),
                "sol_fraction": round(mair_mpix / mair_sol, 3),
                "vs_soft_target": round(mair_mpix / 0.4, 3),
            }
        ),
        flush=True,
    )

    # --- Restormer @256 (serving, engine batch regime) --------------------
    from tpuir.models.restormer import Restormer
    from tpuir.models import restormer_fused

    batch = int(os.environ.get("TPUIR_BENCH_BATCH", "8"))
    size = int(os.environ.get("TPUIR_BENCH_SIZE", "256"))
    rest = Restormer()
    rp = rest.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    x = jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32)
    if jax.default_backend() != "cpu" and os.environ.get("TPUIR_FUSED", "1") != "0":
        apply_fn = restormer_fused.make_apply_fn(
            ln_bias=True, mm_bf16=True, row_tile=16, io_bf16=True,
            fast_gelu=True,
        )
        rest_mpix = measure(apply_fn, rp, x, iters)
    else:
        rest_mpix = measure(rest.apply, rp, x, iters)
    a100_est = float(os.environ.get(
        "TPUIR_BENCH_A100_MPIXPS",
        est.get("Restormer@256", {}).get("a100_device_mpix_per_s", 2.876),
    ))
    # v5e flop SoL: 335 GFLOP @256 (XLA count) / measured 164 TFLOP/s
    rest_sol = 256 * 256 / (335.0e9 / _PEAK) / 1e6
    print(
        json.dumps(
            {
                "metric": f"restormer_serving_{size}px_b{batch}_throughput",
                "value": round(rest_mpix, 3),
                "unit": "Mpix/s/chip",
                "vs_baseline": round(rest_mpix / (4.0 * a100_est), 3),
                "vs_a100": round(rest_mpix / a100_est, 3),
                "sol_fraction": round(rest_mpix / rest_sol, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
