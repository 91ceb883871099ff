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

x = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
msrv = MaIR(scan_io_dtype="bfloat16")
p = msrv.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

os.environ["TPUIR_NSS"] = "stripe"
t_stripe = timeit("MaIR@128 serving stripe", lambda q, pp: msrv.apply(pp, q), x, p)
os.environ["TPUIR_NSS"] = "0"
t_take = timeit("MaIR@128 serving take+fused_proj", lambda q, pp: msrv.apply(pp, q), x, p)
os.environ["TPUIR_NSS"] = "stripe"

u = MaIRUNet(scan_io_dtype="bfloat16")
pu = u.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
t_us = timeit("MaIRUNet@128 serving stripe", lambda q, pp: u.apply(pp, q), x, pu)
os.environ["TPUIR_NSS"] = "0"
t_ut = timeit("MaIRUNet@128 serving take+fused_proj", lambda q, pp: u.apply(pp, q), x, pu)

# accuracy spot check on TPU: stripe vs take path, same weights
os.environ["TPUIR_NSS"] = "stripe"
y1 = np.asarray(msrv.apply(p, x))
os.environ["TPUIR_NSS"] = "0"
y0 = np.asarray(msrv.apply(p, x))
print("MaIR stripe-vs-take max abs delta:", np.abs(y1 - y0).max())
