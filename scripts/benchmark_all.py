#!/usr/bin/env python
"""Per-model throughput benchmark at each model's harness patch size.

Prints a Mpix/s/chip table (and writes benchmarks/results.json). Random
weights — throughput does not depend on weight values. Measurements run
inside a single jitted fori_loop with the input chained on a mean of the
output (defeats loop-invariant hoisting) and a scalar fetch (see bench.py
for why that is required on the tunneled backend).

Rows cover both precision modes:
  * parity  — float32-pinned matmuls (the 0.05 dB CSV mode)
  * serving — bf16 MXU passes w/ f32 accumulation (documented fast mode)

--large additionally times every harness patch shape (Inception@768,
MobileNet@2048, Restormer@512, MaIR@384, MaIRUNet@384 — VERDICT r1 item 5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def cases(large=False):
    from tpuir.models.dncnn import DnCNN
    from tpuir.models.rednet import REDNet
    from tpuir.models.restormer import Restormer
    from tpuir.models import restormer_fused
    from tpuir.models.mair import MaIR
    from tpuir.models.mair_unet import MaIRUNet
    from tpuir.models.deblurgan import FPNMobileNet, FPNInception

    fused_parity = restormer_fused.make_apply_fn(ln_bias=True)
    fused_serving = restormer_fused.make_apply_fn(
        ln_bias=True, mm_bf16=True, row_tile=16, io_bf16=True, fast_gelu=True
    )
    # (name, module, apply override, in_ch, patch size, precision, batch)
    rows = [
        ("REDNet@128 parity", REDNet(), None, 1, 128, "f32", 1),
        ("REDNet@128 serving", REDNet(), None, 1, 128, "default", 1),
        # b=8 = the engine's default patch-batch regime (engine.py
        # batch_size=8) — the per-image rows understate the conv models,
        # which are pipeline-bound at b=1
        ("REDNet@128 serving b=8", REDNet(), None, 1, 128, "default", 8),
        ("DnCNN@256 parity", DnCNN(1, 1, 64, 17), None, 1, 256, "f32", 1),
        ("DnCNN@256 serving", DnCNN(1, 1, 64, 17), None, 1, 256, "default", 1),
        ("DnCNN@256 serving b=8", DnCNN(1, 1, 64, 17), None, 1, 256,
         "default", 8),
        ("Restormer@256 parity (fused)", Restormer(), fused_parity, 3, 256, "f32", 1),
        ("Restormer@256 serving (fused bf16)", Restormer(), fused_serving, 3, 256,
         "default", 1),
        ("Restormer@256 serving b=8", Restormer(), fused_serving, 3, 256,
         "default", 8),
        ("DeblurGANv2-MobileNet@256 parity", FPNMobileNet(), None, 3, 256, "f32", 1),
        # serving = the phase-packed path (zoo precision='serving')
        ("DeblurGANv2-MobileNet@256 serving", FPNMobileNet(phase_io=True),
         None, 3, 256, "default", 1),
        ("DeblurGANv2-MobileNet@256 serving b=8", FPNMobileNet(phase_io=True),
         None, 3, 256, "default", 8),
        ("MaIR-CDN@128 parity", MaIR(), None, 3, 128, "f32", 1),
        ("MaIR-CDN@128 serving", MaIR(scan_io_dtype="bfloat16"), None, 3, 128,
         "default", 1),
        ("MaIRUNet@128 parity", MaIRUNet(), None, 3, 128, "f32", 1),
        ("MaIRUNet@128 serving", MaIRUNet(scan_io_dtype="bfloat16"), None, 3, 128,
         "default", 1),
    ]
    if large:
        rows += [
            ("Restormer@512 serving (fused bf16)", Restormer(), fused_serving,
             3, 512, "default", 1),
            ("MaIR-CDN@384 serving", MaIR(scan_io_dtype="bfloat16"), None, 3, 384,
             "default", 1),
            ("MaIRUNet@384 serving", MaIRUNet(scan_io_dtype="bfloat16"), None,
             3, 384, "default", 1),
            ("DeblurGANv2-Inception@768 serving", FPNInception(packed_tail=True),
             None, 3, 768, "default", 1),
            ("DeblurGANv2-MobileNet@2048 serving", FPNMobileNet(phase_io=True),
             None, 3, 2048, "default", 1),
        ]
    return rows


# Measured bf16 matmul peak on this v5e: the 8192^3 chained-loop
# measurement in benchmarks/micro_vpu.py (164 TF/s, ~83% of the 197 TF/s
# nominal). Round 4 used a stale 45 TF/s figure measured per-dispatch
# through the tunnel (the ~25 ms dispatch latency polluted it), which
# produced impossible >100% MFU cells; every row is ratioed against the
# same measured ceiling so MFU is comparable across modes.
def _peak_flops():
    try:
        mv = json.load(open(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "benchmarks", "micro_vpu.json")))
        return mv["bf16_matmul_peak_tflops"] * 1e12
    except Exception:
        return 164e12


PEAK_FLOPS = _peak_flops()

# Derived A100 baselines (benchmarks/a100_estimate.py -> BASELINE.md):
# row-name prefix -> a100_estimates.json key. vs_a100 = ours / A100-device;
# vs_target = ours / (4 x A100-device), the BASELINE.json north star.
_A100_KEY = {
    "REDNet@128": "REDNet@128",
    "DnCNN@256": "DnCNN-nonblind-gray@256",
    "Restormer@256": "Restormer@256",
    "Restormer@512": "Restormer@512",
    "DeblurGANv2-MobileNet@256": "DeblurGANv2-MobileNet@256",
    "DeblurGANv2-MobileNet@2048": "DeblurGANv2-MobileNet@2048",
    "DeblurGANv2-Inception@768": "DeblurGANv2-Inception@768",
    "MaIR-CDN@128": "MaIR-CDN@128",
    "MaIR-CDN@384": "MaIR-CDN@384",
    "MaIRUNet@128": "MaIRUNet@128",
    "MaIRUNet@384": "MaIRUNet@384",
}


def a100_device_mpix(row_name):
    path = os.path.join(os.path.dirname(__file__), "..",
                        "benchmarks", "a100_estimates.json")
    try:
        est = json.load(open(path))["results"]
    except Exception:
        return None
    for prefix, key in _A100_KEY.items():
        if row_name.startswith(prefix) and key in est:
            return est[key]["a100_device_mpix_per_s"]
    return None

_flops_cache: dict = {}


def flops_estimate(model, in_ch, size, batch):
    """Per-forward FLOPs via XLA cost analysis of the pure-XLA graph.

    Lowered with TPUIR_FUSED=0 so the count reflects the XLA composition
    (Pallas kernels report no flops to the analysis). Note the XLA-fallback
    selective scan is a blocked associative scan, which does a log-factor
    more work than the sequential recurrence — MaIR rows are therefore an
    upper-bound flop count (MFU slightly optimistic).
    """
    if getattr(model, "phase_io", False):
        # count the logical model's flops (the packed path is numerically
        # the same network; its dense packed kernels would overcount)
        model = type(model)()
    key = (type(model).__name__, in_ch, size, batch)
    if key in _flops_cache:
        return _flops_cache[key]
    prev = os.environ.get("TPUIR_FUSED")
    os.environ["TPUIR_FUSED"] = "0"
    try:
        x = jnp.zeros((batch, size, size, in_ch), jnp.float32)
        xi = jnp.zeros((1, min(size, 128), min(size, 128), in_ch), jnp.float32)
        params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xi))
        params = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), params
        )
        # Lower for CPU: FLOP counts are backend-independent, the axon TPU
        # backend returns None from pre-compile cost_analysis, and a CPU
        # compile of the XLA graph takes <1 s vs minutes through the remote
        # TPU compiler.
        cpu = jax.devices("cpu")[0]
        lowered = jax.jit(model.apply, device=cpu).lower(params, x)
        cost = lowered.cost_analysis()
        if cost is None:
            cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan"))) if cost else float("nan")
    except Exception:
        flops = float("nan")
    finally:
        if prev is None:
            os.environ.pop("TPUIR_FUSED", None)
        else:
            os.environ["TPUIR_FUSED"] = prev
    _flops_cache[key] = flops
    return flops


def bench_case(model, apply_override, in_ch, size, precision, batch, iters=10):
    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, in_ch), jnp.float32
    )
    if getattr(model, "phase_io", False):
        # phase-packed serving path: bench the pack4 layout the engine feeds
        from tpuir.models.deblurgan.fold import space_to_depth

        x = space_to_depth(x, 4)
    # init at >=128: the Inception-ResNet-v2 trunk reduces 64^2 to an empty
    # spatial axis before the FPN's reflect pads
    init_hw = min(size, 128)
    init_x = jnp.zeros((1, init_hw, init_hw, in_ch), jnp.float32)
    if getattr(model, "phase_io", False):
        from tpuir.models.deblurgan.fold import space_to_depth

        init_x = space_to_depth(init_x, 4)
    params = model.init(jax.random.PRNGKey(0), init_x)
    apply_fn = apply_override or model.apply

    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            if precision == "f32":
                with jax.default_matmul_precision("float32"):
                    y = apply_fn(p, qq)
            else:
                y = apply_fn(p, qq)
            m = jnp.mean(y)
            return acc + m, qq + m * 1e-20

        return jax.lax.fori_loop(0, iters, body, (0.0, q))[0]

    np.asarray(loop(params, x))  # compile
    t0 = time.perf_counter()
    np.asarray(loop(params, x))
    dt = time.perf_counter() - t0
    per_ms = dt / iters * 1000
    return per_ms, batch * size * size / per_ms / 1000.0


def main():
    large = "--large" in sys.argv
    only = None  # --only <substr>: re-run matching rows, merge into the json
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    np.asarray(jnp.ones((8, 8)))  # tunnel warm-up
    out_path = "benchmarks/results_large.json" if large else "benchmarks/results.json"
    results = {}
    if (large or only) and os.path.exists(out_path):
        results = json.load(open(out_path)).get("results", {})
    rows = cases(large)
    if large:  # run only the large-shape rows; results merge into the json
        rows = rows[len(cases(False)):]
    if only:
        rows = [r for r in rows if only.lower() in r[0].lower()]
    print(f"{'Model':40s} {'ms/fwd':>9s} {'Mpix/s':>9s} {'MFU%':>6s} "
          f"{'vs_A100':>8s} {'vs_4x':>6s}")
    for name, model, override, in_ch, size, prec, batch in rows:
        try:
            # one retry: the tunneled remote-compile helper occasionally
            # 500s transiently; a cell must not record an infra hiccup
            try:
                ms, mpix = bench_case(model, override, in_ch, size, prec, batch)
            except Exception as e:
                if "INTERNAL" not in str(e) and "HTTP 5" not in str(e):
                    raise
                print(f"{name:40s} transient: {str(e)[:80]} — retrying",
                      flush=True)
                time.sleep(20)
                ms, mpix = bench_case(model, override, in_ch, size, prec, batch)
            flops = flops_estimate(model, in_ch, size, batch)
            mfu = flops / (ms / 1000.0) / PEAK_FLOPS * 100.0
            results[name] = {"ms_per_forward": round(ms, 2), "mpix_per_s": round(mpix, 3),
                             "batch": batch}
            if mfu == mfu:  # not NaN
                results[name]["mfu_pct"] = round(mfu, 1)
            a100 = a100_device_mpix(name)
            va = vt = float("nan")
            if a100:
                va, vt = mpix / a100, mpix / (4.0 * a100)
                results[name]["vs_a100"] = round(va, 3)
                results[name]["vs_target_4x_a100"] = round(vt, 3)
            print(f"{name:40s} {ms:9.1f} {mpix:9.2f} {mfu:6.1f} "
                  f"{va:8.2f} {vt:6.2f}", flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"{name:40s} failed: {type(e).__name__}: {str(e)[:120]}", flush=True)
    os.makedirs("benchmarks", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(
            {"device": jax.devices()[0].platform,
             "precision": "parity=float32-pinned, serving=bf16-MXU-passes",
             "peak_flops": PEAK_FLOPS,
             "results": results}, f, indent=2,
        )
    print(f"written {out_path}")


if __name__ == "__main__":
    main()
