"""A/B: bf16 level-1 recurrence in the stripe NSS kernel (TPUIR_RECUR_BF16).

Measures whether Mosaic's bf16 elementwise path buys anything on the
scan-bound MaIR forward (the level-1 loop is ~2/3 of the 75 ms serving
forward and is VPU-op-bound per docs/STATUS.md), and pins the accuracy
delta vs the f32-recurrence serving path on the same weights.
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
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt

np.asarray(jnp.ones((8, 8)))
rng = np.random.RandomState(0)
from tpuir.models.mair import MaIR
from tpuir.models.mair_unet import MaIRUNet

os.environ["TPUIR_NSS"] = "stripe"
x = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
msrv = MaIR(scan_io_dtype="bfloat16")
p = msrv.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

os.environ["TPUIR_RECUR_BF16"] = "0"
timeit("MaIR@128 serving stripe f32-recurrence", lambda q, pp: msrv.apply(pp, q), x, p)
y_f32 = np.asarray(msrv.apply(p, x))
os.environ["TPUIR_RECUR_BF16"] = "1"
timeit("MaIR@128 serving stripe bf16-recurrence", lambda q, pp: msrv.apply(pp, q), x, p)
y_bf16 = np.asarray(msrv.apply(p, x))
print("MaIR recur_bf16-vs-f32 max abs delta:", np.abs(y_bf16 - y_f32).max())

u = MaIRUNet(scan_io_dtype="bfloat16")
pu = u.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
os.environ["TPUIR_RECUR_BF16"] = "0"
timeit("MaIRUNet@128 serving f32-recurrence", lambda q, pp: u.apply(pp, q), x, pu)
os.environ["TPUIR_RECUR_BF16"] = "1"
timeit("MaIRUNet@128 serving bf16-recurrence", lambda q, pp: u.apply(pp, q), x, pu)
os.environ.pop("TPUIR_RECUR_BF16", None)
