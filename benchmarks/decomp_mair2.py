"""Decompose the 74ms MaIR@128 stripe serving forward: time model variants
with stages knocked out (monkeypatched SSMixer/MaIRBlock), TPU."""
import os, sys, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

os.environ["TPUIR_NSS"] = "stripe"

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
    print(f"{name:50s} {dt:8.2f} ms", flush=True)
    return dt

np.asarray(jnp.ones((8, 8)))
rng = np.random.RandomState(0)
import tpuir.models.mair as M

x = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
msrv = M.MaIR(scan_io_dtype="bfloat16")
p = msrv.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

base = timeit("full stripe serving", lambda q, pp: msrv.apply(pp, q), x, p)

# knock out the MLP (ffn) inside MaIRBlock
orig_mlp = M.Mlp.__call__
M.Mlp.__call__ = lambda self, x: x * 0.99
d = timeit("no MLP", lambda q, pp: msrv.apply(pp, q), x, p)
print(f"    -> MLP cost ~{base-d:.2f} ms", flush=True)
M.Mlp.__call__ = orig_mlp

# knock out the block LNs (ln_1/ln_2 + out_norm)
orig_ln = M.TorchLayerNorm.__call__
M.TorchLayerNorm.__call__ = lambda self, x: x
d = timeit("no LayerNorms", lambda q, pp: msrv.apply(pp, q), x, p)
print(f"    -> LN cost ~{base-d:.2f} ms", flush=True)
M.TorchLayerNorm.__call__ = orig_ln

# knock out in_proj/dwconv/out_proj wrapping of the scan: replace the whole
# SSMixer body with just the stripe scan on a fixed-width input.
# (flax resolves @nn.compact at class creation, so this must be a subclass
# swapped into the module namespace — not a monkeypatched __call__.)
import math
orig_mixer_cls = M.SSMixer

class ScanOnlyMixer(M.SSMixer):
    @nn.compact
    def __call__(self, x, ids, shift=False):
        B, H, W, _ = x.shape
        d_inner = int(self.expand * self.d_model)
        R = math.ceil(self.d_model / 16)
        N = self.d_state
        K = 4
        xz = nn.Dense(d_inner, use_bias=False, name="in_proj_slim")(x)
        x_proj_w = self.param("x_proj_weight", nn.initializers.normal(0.02), (K, R + 2 * N, d_inner))
        dt_w = self.param("dt_projs_weight", nn.initializers.normal(0.02), (K, d_inner, R))
        dt_b = self.param("dt_projs_bias", nn.initializers.zeros, (K, d_inner))
        A_logs = self.param("A_logs", nn.initializers.normal(0.02), (K, d_inner, N))
        Ds = self.param("Ds", nn.initializers.ones, (K, d_inner))
        from tpuir.ops.nss_stripe import nss_scan_stripe, combine_halves
        out = nss_scan_stripe(
            xz, x_proj_w, dt_w, -jnp.exp(A_logs.astype(jnp.float32)), Ds, dt_b,
            scan_len=self.scan_len, shift=shift, serving=True)
        g = jnp.ones((B, 4, d_inner), jnp.float32) * 0.25
        y = combine_halves(*out[:4], g, shift, self.scan_len)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj_slim")(
            y.astype(jnp.bfloat16)).astype(x.dtype)

ScanOnlyMixer.__name__ = "SSMixer"  # keep flax param paths identical
M.SSMixer = ScanOnlyMixer
p2 = msrv.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
d = timeit("scan-only mixer (no dwconv/silu/gate/out_norm)",
           lambda q, pp: msrv.apply(pp, q), x, p2)
print(f"    -> mixer-glue cost ~{base-d:.2f} ms", flush=True)
M.SSMixer = orig_mixer_cls
