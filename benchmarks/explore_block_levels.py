#!/usr/bin/env python
"""Per-level fused TransformerBlock cost at Restormer's released dims."""
import os, sys, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from tpuir.ops.fused_block import fused_transformer_block

def timeit(name, fn, x0, *rest, iters=20):
    @jax.jit
    def loop(x0, *rest):
        def body(i, carry):
            acc, x = carry
            y = fn(x, *rest)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, x + (m * 1e-20).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, (0.0, x0))[0]
    np.asarray(loop(x0, *rest))
    t0 = time.perf_counter(); np.asarray(loop(x0, *rest))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt

def block_params(C, rng):
    hidden = int(C * 2.66)
    def t(*s): return jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
    return {
        "norm1": {"weight": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "attn": {
            "qkv": {"kernel": t(1, 1, C, 3 * C)},
            "qkv_dwconv": {"kernel": t(3, 3, 1, 3 * C)},
            "temperature": None,  # set per-heads below
            "project_out": {"kernel": t(1, 1, C, C)},
        },
        "norm2": {"weight": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "ffn": {
            "project_in": {"kernel": t(1, 1, C, 2 * hidden)},
            "dwconv": {"kernel": t(3, 3, 1, 2 * hidden)},
            "project_out": {"kernel": t(1, 1, hidden, C)},
        },
    }

def block_params_h(C, heads, rng):
    p = block_params(C, rng)
    p["attn"]["temperature"] = jnp.ones((heads, 1, 1))
    return p


def main():
    np.asarray(jnp.ones((8, 8)))
    rng = np.random.RandomState(0)
    total = 0.0
    cases = [  # (H, C, heads, count at b=1)
        ("enc1", 256, 48, 1, 4),
        ("dec1+refine", 256, 96, 1, 8),
        ("enc2/dec2", 128, 96, 2, 12),
        ("enc3/dec3", 64, 192, 4, 12),
        ("latent", 32, 384, 8, 8),
    ]
    for name, H, C, heads, cnt in cases:
        x = jnp.asarray(rng.rand(1, H, H, C), jnp.float32)
        p = block_params_h(C, heads, rng)
        dt = timeit(f"block {name} {H}x{H}x{C} h={heads}",
                    lambda q, pp: fused_transformer_block(
                        q, pp, heads=heads, ln_bias=True, row_tile=16,
                        mm_bf16=True),
                    x, p)
        total += dt * cnt
        hbm = (1 * H * H * C * 4 * 3.5) / 1e6
        print(f"    x{cnt} -> {dt*cnt:7.3f} ms   (~{hbm:.0f} MB hbm floor/block)")
    print(f"sum over blocks (b=1): {total:.1f} ms")

if __name__ == "__main__":
    main()
