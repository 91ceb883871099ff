"""Round-4 MaIR serving sweep: fused prologue A/B, batch regime, MaIRUNet.

Levers measured this round (docs/STATUS.md r4):
  * prologue — in_proj+dwconv+SiLU+pad+transpose fused into one Pallas
    pass (tpuir/ops/nss_prologue.py), attacking the ~9.5 ms mixer-glue
    bucket of benchmarks/decomp_mair2.py.
  * batch — the engine serves patch grids, so b>1 is the real regime;
    amortizes per-step overheads if any remain.
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
    print(f"{name:56s} {dt:8.2f} ms  {mpix:6.3f} Mpix/s", flush=True)
    return dt

np.asarray(jnp.ones((8, 8)))
rng = np.random.RandomState(0)
from tpuir.models.mair import MaIR
from tpuir.models.mair_unet import MaIRUNet

os.environ["TPUIR_NSS"] = "stripe"
x = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
x4 = jnp.asarray(rng.rand(4, 128, 128, 3), jnp.float32)
msrv = MaIR(scan_io_dtype="bfloat16")
p = msrv.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

os.environ["TPUIR_PROLOGUE"] = "0"
timeit("MaIR@128 serving no-prologue", lambda q, pp: msrv.apply(pp, q), x, p)
y0 = np.asarray(msrv.apply(p, x))
os.environ["TPUIR_PROLOGUE"] = "1"
timeit("MaIR@128 serving prologue", lambda q, pp: msrv.apply(pp, q), x, p)
y1 = np.asarray(msrv.apply(p, x))
print("prologue-vs-not max abs delta:", np.abs(y1 - y0).max(), flush=True)

timeit("MaIR@128 serving prologue b=4", lambda q, pp: msrv.apply(pp, q), x4, p)

u = MaIRUNet(scan_io_dtype="bfloat16")
pu = u.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
os.environ["TPUIR_PROLOGUE"] = "0"
timeit("MaIRUNet@128 serving no-prologue", lambda q, pp: u.apply(pp, q), x, pu)
os.environ["TPUIR_PROLOGUE"] = "1"
timeit("MaIRUNet@128 serving prologue", lambda q, pp: u.apply(pp, q), x, pu)
