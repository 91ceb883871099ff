#!/usr/bin/env python
"""Round-3 A/B battery on the level-1 fused Restormer blocks (the profile
shows decoder_level1/refinement C=96 @256^2 at ~5.2 ms each x8 and
encoder_level1 C=48 at ~3.5 ms x4 = ~58% of the b=8 forward).

Isolated-call absolutes carry ~1.3 ms tunnel inflation; compare DELTAS.
"""
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
    print(f"{name:58s} {dt:8.3f} ms", flush=True)
    return dt

def block_params(C, heads, rng):
    hidden = int(C * 2.66)
    def t(*s): return jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
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
    np.asarray(jnp.ones((8, 8)))
    rng = np.random.RandomState(0)
    B = int(os.environ.get("B", "8"))
    for C, heads in ((96, 1), (48, 1)):
        x = jnp.asarray(rng.rand(B, 256, 256, C), jnp.float32)
        xb = x.astype(jnp.bfloat16)
        p = block_params(C, heads, rng)
        base = {}
        for name, kw, xx in [
            ("baseline rt16", dict(row_tile=16), x),
            ("rt32", dict(row_tile=32), x),
            ("rt8", dict(row_tile=8), x),
            ("fast_gelu", dict(row_tile=16, fast_gelu=True), x),
            ("rt32+fast_gelu", dict(row_tile=32, fast_gelu=True), x),
            ("bf16 io", dict(row_tile=16), xb),
            ("bf16 io + rt32 + fast_gelu",
             dict(row_tile=32, fast_gelu=True), xb),
        ]:
            try:
                dt = timeit(
                    f"C={C} b={B} {name}",
                    lambda q, pp: fused_transformer_block(
                        q, pp, heads=heads, ln_bias=True, mm_bf16=True, **kw),
                    xx, p)
                base[name] = dt
            except Exception as e:
                print(f"C={C} {name} failed: {type(e).__name__}: {str(e)[:120]}")

if __name__ == "__main__":
    main()
