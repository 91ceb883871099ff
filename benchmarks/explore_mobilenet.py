"""Where do the 58 ms of DeblurGANv2-MobileNet@2048 go?

Stage-prefix timing of the FPN-MobileNet forward at 2048px serving mode,
plus a bf16-activation variant (params + activations cast to bf16; the
TrainNorm statistics stay f32 internally). Prefix models are built from
the SAME submodule classes as the production model, so each prefix's cost
is the production cost of that stage; jit DCEs nothing because each prefix
returns the live tensor's mean.

Run: python benchmarks/explore_mobilenet.py [size]
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

from tpuir.models.deblurgan.fpn_mobilenet import (  # noqa: E402
    FPNMobileNet,
    _MNV2_FEATURES,
    _ConvBNRelu6,
    _ConvINRelu,
    _FPNHead,
    _InvertedResidual,
)
from tpuir.models.deblurgan.norms import upsample_nearest  # noqa: E402

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ITERS = 10


class Prefix(nn.Module):
    """FPNMobileNet forward truncated after `stage`."""

    stage: str

    @nn.compact
    def __call__(self, x):
        nf, nfp = 64, 128
        h = _ConvBNRelu6(32, 2, name="features_0")(x)
        taps = {}
        inp = 32
        for i, (t, c, s) in enumerate(_MNV2_FEATURES, start=1):
            h = _InvertedResidual(inp, c, s, t, name=f"features_{i}")(h)
            inp = c
            if i in (1, 3, 6, 10, 15):
                taps[i] = h
        enc0, enc1, enc2, enc3, enc4 = (
            taps[1], taps[3], taps[6], taps[10], taps[15])
        if self.stage == "backbone":
            return enc0.mean() + enc1.mean() + enc2.mean() + enc3.mean() + enc4.mean()

        lateral4 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral4")(enc4)
        lateral3 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral3")(enc3)
        lateral2 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral2")(enc2)
        lateral1 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral1")(enc1)
        lateral0 = nn.Conv(nfp // 2, (1, 1), use_bias=False, name="lateral0")(enc0)

        map4 = lateral4
        map3 = _ConvINRelu(nfp, name="td1")(lateral3 + upsample_nearest(map4, 2))
        map2 = _ConvINRelu(nfp, name="td2")(lateral2 + upsample_nearest(map3, 2))
        map1 = _ConvINRelu(nfp, name="td3")(lateral1 + upsample_nearest(map2, 2))
        if self.stage == "td":
            return map1.mean() + map2.mean() + map3.mean() + map4.mean() + lateral0.mean()

        map4 = upsample_nearest(_FPNHead(nf, nf, name="head4")(map4), 8)
        map3 = upsample_nearest(_FPNHead(nf, nf, name="head3")(map3), 4)
        map2 = upsample_nearest(_FPNHead(nf, nf, name="head2")(map2), 2)
        map1 = _FPNHead(nf, nf, name="head1")(map1)
        if self.stage == "heads":
            return map1.mean() + map2.mean() + map3.mean() + map4.mean() + lateral0.mean()

        smoothed = _ConvINRelu(nf, name="smooth")(
            jnp.concatenate([map4, map3, map2, map1], axis=-1))
        if self.stage == "smooth":
            return smoothed.mean() + lateral0.mean()
        smoothed = upsample_nearest(smoothed, 2)
        smoothed = _ConvINRelu(nf // 2, name="smooth2")(smoothed + lateral0)
        if self.stage == "smooth2":
            return smoothed.mean()
        smoothed = upsample_nearest(smoothed, 2)
        final = nn.Conv(3, (3, 3), padding=1, name="final")(smoothed)
        return jnp.clip(jnp.tanh(final) + x, -1.0, 1.0).mean()


def timeit(apply_fn, params, x):
    @jax.jit
    def loop(p, q):
        def body(i, carry):
            acc, qq = carry
            m = apply_fn(p, qq)
            if m.ndim:  # full model returns an image
                m = m.mean()
            return acc + m, qq + (m * 1e-20).astype(qq.dtype)
        return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), q))[0]

    np.asarray(loop(params, x))
    t0 = time.perf_counter()
    np.asarray(loop(params, x))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, SIZE, SIZE, 3).astype(np.float32) * 2 - 1)
    print(f"size={SIZE}")

    prev = 0.0
    for stage in ["backbone", "td", "heads", "smooth", "smooth2", "full"]:
        m = Prefix(stage=stage)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        ms = timeit(m.apply, p, x)
        print(f"  prefix {stage:9s}: {ms:8.2f} ms  (+{ms - prev:7.2f})", flush=True)
        prev = ms

    # Full production model, f32 (sanity vs results_large) and bf16 params+acts
    full = FPNMobileNet()
    p = full.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    ms = timeit(full.apply, p, x)
    print(f"  production f32 : {ms:8.2f} ms", flush=True)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    xb = x.astype(jnp.bfloat16)
    msb = timeit(full.apply, pb, xb)
    print(f"  production bf16: {msb:8.2f} ms", flush=True)
    # bf16 output delta vs f32 on the same input (random weights)
    y32 = np.asarray(full.apply(p, x[:, :256, :256, :]))
    yb = np.asarray(full.apply(pb, xb[:, :256, :256, :]).astype(jnp.float32))
    mse = float(np.mean((y32 - yb) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse else float("inf")  # range [-1,1]
    print(f"  bf16 vs f32 @256: mse={mse:.3e}  psnr={psnr:.2f} dB")


if __name__ == "__main__":
    main()
