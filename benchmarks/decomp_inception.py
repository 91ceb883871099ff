"""Stage decomposition of FPN-Inception@768 serving: trunk vs FPN vs tail.

The lighter counterpart of the MobileNet roofline (VERDICT r4 item 1):
where do the ~11 ms go? Three nested prefixes at the harness shape —
Inception-ResNet-v2 trunk alone, + FPN laterals/td/heads/smooth, full
model — timed in-jit; differences attribute the stages.

Run on the TPU: python benchmarks/decomp_inception.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from tpuir.models.deblurgan import FPNInception  # noqa: E402
from tpuir.models.deblurgan.inception_resnet_v2 import InceptionTrunk  # noqa: E402

ITERS = 20


def timeit(apply_fn, params, x):
    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            out = apply_fn(p, qq)
            m = sum(o.mean() for o in out) if isinstance(out, (tuple, list)) \
                else out.mean()
            return acc + m, qq + (m * 1e-20).astype(qq.dtype)
        return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), q))[0]

    np.asarray(loop(params, x))
    best = min(
        (lambda t0: (np.asarray(loop(params, x)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(2)
    )
    return best / ITERS * 1e3


class TrunkOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        return InceptionTrunk(name="inception")(x)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 768, 768, 3).astype(np.float32) * 2 - 1)

    full = FPNInception(packed_tail=True)
    p = full.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3), jnp.float32))

    trunk = TrunkOnly()
    pt = {"params": {"inception": p["params"]["inception"]}}
    ms_trunk = timeit(trunk.apply, pt, x)
    ms_full = timeit(full.apply, p, x)
    ms_plain = timeit(FPNInception().apply, p, x)
    print(f"trunk alone @768: {ms_trunk:.2f} ms", flush=True)
    print(f"full (packed tail): {ms_full:.2f} ms -> FPN+tail = "
          f"{ms_full - ms_trunk:.2f} ms", flush=True)
    print(f"full (plain tail):  {ms_plain:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
