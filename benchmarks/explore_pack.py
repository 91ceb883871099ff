#!/usr/bin/env python
"""Lane-packing A/B for the fused Restormer block (round 3).

The C=48 encoder_level1 blocks contract K=48 of the MXU's 128 lanes (62%
idle) and run every VPU op at 48/128 lane utilization. lane_pack=2 runs
two images side by side against block-diagonal weights. Stages:

  block  — isolated C=48 b=8 block: pack 1 vs 2 (deltas meaningful,
           absolutes carry ~1.3 ms tunnel inflation)
  model  — full Restormer b=8 @256 serving: lane_pack 1 vs 2
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


def timeit(name, fn, x0, *rest, iters=20):
    @jax.jit
    def loop(x0, *rest):
        def body(i, carry):
            acc, q = carry
            y = fn(q, *rest)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, q + (m * 1e-20).astype(q.dtype)

        return jax.lax.fori_loop(0, iters, body, (0.0, x0))[0]

    np.asarray(loop(x0, *rest))
    t0 = time.perf_counter()
    np.asarray(loop(x0, *rest))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:56s} {dt:8.3f} ms", flush=True)
    return dt


def block_params(C, heads, rng):
    hidden = int(C * 2.66)

    def t(*s):
        return jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)

    return {
        "norm1": {"weight": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "attn": {
            "qkv": {"kernel": t(1, 1, C, 3 * C)},
            "qkv_dwconv": {"kernel": t(3, 3, 1, 3 * C)},
            "temperature": jnp.ones((heads, 1, 1)),
            "project_out": {"kernel": t(1, 1, C, C)},
        },
        "norm2": {"weight": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "ffn": {
            "project_in": {"kernel": t(1, 1, C, 2 * hidden)},
            "dwconv": {"kernel": t(3, 3, 1, 2 * hidden)},
            "project_out": {"kernel": t(1, 1, hidden, C)},
        },
    }


def main():
    which = sys.argv[1:] or ["all"]
    np.asarray(jnp.ones((8, 8)))
    rng = np.random.RandomState(0)

    if "all" in which or "block" in which:
        from tpuir.ops.fused_block import fused_transformer_block

        for C in (48,):
            x = jnp.asarray(rng.rand(8, 256, 256, C), jnp.bfloat16)
            p = block_params(C, 1, rng)
            for pk in (1, 2):
                timeit(
                    f"block C={C} b=8 @256 bf16io pack={pk}",
                    lambda q, pp, pk=pk: fused_transformer_block(
                        q, pp, heads=1, ln_bias=True, row_tile=16,
                        mm_bf16=True, fast_gelu=True, lane_pack=pk),
                    x, p)

    if "all" in which or "model" in which:
        from tpuir.models.restormer import Restormer
        from tpuir.models import restormer_fused

        m = Restormer()
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32))
        x = jnp.asarray(rng.rand(8, 256, 256, 3), jnp.float32)
        for pk in (1, 2):
            fn = restormer_fused.make_apply_fn(
                ln_bias=True, mm_bf16=True, row_tile=16, io_bf16=True,
                fast_gelu=True, lane_pack=pk)
            dt = timeit(f"Restormer b=8 @256 serving lane_pack={pk}",
                        lambda q, pp, fn=fn: fn(pp, q), x, p, iters=10)
            print(f"    -> {8 * 256 * 256 / dt / 1000:.2f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
