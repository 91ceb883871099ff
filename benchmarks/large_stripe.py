import os, sys, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

def timeit(name, fn, x0, *rest, iters=3):
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

x = jnp.asarray(rng.rand(1, 384, 384, 3), jnp.float32)
msrv = MaIR(scan_io_dtype="bfloat16")
p = msrv.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
os.environ["TPUIR_NSS"] = "stripe"
timeit("MaIR@384 serving stripe", lambda q, pp: msrv.apply(pp, q), x, p)


u = MaIRUNet(scan_io_dtype="bfloat16")
pu = u.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
os.environ["TPUIR_NSS"] = "stripe"
timeit("MaIRUNet@384 serving stripe", lambda q, pp: u.apply(pp, q), x, pu)

