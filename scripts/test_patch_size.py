#!/usr/bin/env python
"""Max-patch-size search via compile-time memory analysis.

TPU-native replacement for the reference's CUDA-OOM binary search
(/root/reference/scripts/test_patch_size.py, src/utils.py:60-116): instead
of provoking out-of-memory at runtime, each candidate size is jit-compiled
and XLA's memory analysis (argument + output + temp + generated code bytes)
is compared against the device's memory budget. Same binary-search
protocol: step 16, upper bound 2048.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp


def device_budget_bytes() -> int:
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    # CPU or stats-less backend: assume 16 GB (v5e HBM) for the analysis
    return 16 * 1024**3


def fits(model, in_ch: int, size: int, budget: int) -> bool:
    x = jnp.zeros((1, size, size, in_ch), jnp.float32)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    try:
        mem = jax.jit(model.apply).lower(params, x).compile().memory_analysis()
    except Exception as e:
        print(f"  size {size}: compile failed ({type(e).__name__})")
        return False
    if mem is None:
        return True
    total = (
        mem.argument_size_in_bytes
        + mem.output_size_in_bytes
        + mem.temp_size_in_bytes
        + mem.generated_code_size_in_bytes
    )
    print(f"  size {size}: {total / 1e9:.2f} GB of {budget / 1e9:.2f} GB")
    return total <= budget


def find_max_patch_size(model, in_ch=3, max_side=2048, step=16) -> int:
    budget = device_budget_bytes()
    lo, hi = step, int(max_side)
    best = step
    while lo <= hi:
        mid = ((lo + hi) // (2 * step)) * step
        if mid < step:
            mid = step
        if fits(model, in_ch, mid, budget):
            best = mid
            lo = mid + step
        else:
            hi = mid - step
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=None)
    ap.add_argument("--max-side", type=int, default=2048)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from compute_flops import model_table

    for name, model, in_ch in model_table():
        if args.models and not any(m.lower() in name.lower() for m in args.models):
            continue
        best = find_max_patch_size(model, in_ch, max_side=args.max_side)
        print(f"{name}: max patch size {best}")


if __name__ == "__main__":
    main()
