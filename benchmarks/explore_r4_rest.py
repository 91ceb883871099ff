"""Round-4 Restormer serving sweep: row_tile width and batch at 256px b=8.

docs/STATUS.md round-3 ablation: dec1+refinement (C=96 levels) dominate at
35.4 ms of 82.9 and the fused block is serialization-bound, not matmul
-bound. The cheapest lever is fewer, fatter grid steps: row_tile 16 -> 32/48
quarters/thirds the per-image step count at the same traffic. VMEM check:
tile intermediates scale linearly in RT (h1 is RT*W*2hk f32 = RT*1 MB at
C=96/W=256), so RT=48 stays ~60 MB under the 100 MB budget.
"""
import os, sys, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

def timeit(name, fn, x0, *rest, iters=10):
    @jax.jit
    def loop(x0, *rest):
        def body(i, carry):
            acc, q = carry
            y = fn(q, *rest)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, q + (m * 1e-20).astype(q.dtype)
        return jax.lax.fori_loop(0, iters, body, (0.0, x0))[0]
    np.asarray(loop(x0, *rest))
    t0 = time.perf_counter(); np.asarray(loop(x0, *rest))
    dt = (time.perf_counter() - t0) / iters * 1000
    mpix = x0.shape[0] * x0.shape[1] * x0.shape[2] / dt / 1000.0
    print(f"{name:52s} {dt:8.2f} ms  {mpix:7.2f} Mpix/s", flush=True)
    return dt

np.asarray(jnp.ones((8, 8)))
rng = np.random.RandomState(0)
from tpuir.models.restormer import Restormer
from tpuir.models import restormer_fused

rest = Restormer()
rp = rest.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
x8 = jnp.asarray(rng.rand(8, 256, 256, 3), jnp.float32)

for rt, bi in ((16, False), (32, False), (48, False), (64, False),
               (16, True), (8, True), (32, True)):
    fn = restormer_fused.make_apply_fn(
        ln_bias=True, mm_bf16=True, row_tile=rt, io_bf16=True,
        fast_gelu=True, batch_inner=bi)
    try:
        timeit(f"Restormer@256 b=8 serving row_tile={rt} batch_inner={bi}",
               lambda q, pp, fn=fn: fn(pp, q), x8, rp)
    except Exception as e:
        print(f"row_tile={rt} bi={bi} failed: "
              f"{type(e).__name__}: {str(e)[:140]}", flush=True)
