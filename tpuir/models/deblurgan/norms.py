"""Train-mode normalization for DeblurGANv2.

The reference deliberately serves its generators in ``train(True)`` mode
(/root/reference/src/deblurganv2/__init__.py:38), so every InstanceNorm2d
(affine=False) and backbone BatchNorm2d normalizes with the *current*
statistics, not the checkpointed running stats. The reference engine feeds
one patch at a time, so train-mode BatchNorm degenerates to per-sample
(instance) statistics. We implement exactly that — per-sample, per-channel
spatial moments — which is simultaneously (a) bit-parity with the reference
at its batch size of 1 and (b) batch-size invariant, so the TPU engine can
batch patches freely.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TrainNorm(nn.Module):
    """Per-sample spatial normalization over NHWC, optional affine.

    With ``phases > 1`` the input is a space_to_depth phase layout
    (N, Hb, Wb, phases*features), phase-major channel order: statistics
    reduce over (H, W, phase) per original channel — numerically the SAME
    moments as the unpacked tensor (measured perf-neutral,
    benchmarks/explore_packed2.py), so the packed serving path keeps
    exact train-mode semantics with unchanged (features,) params.
    """

    features: int
    affine: bool = False
    eps: float = 1e-5
    phases: int = 1

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        if self.phases > 1:
            n, h, w, pc = x32.shape
            x5 = x32.reshape(n, h, w, self.phases, pc // self.phases)
            mu = jnp.mean(x5, axis=(1, 2, 3), keepdims=True)
            var = jnp.mean((x5 - mu) ** 2, axis=(1, 2, 3), keepdims=True)
            y = (x5 - mu) * jax.lax.rsqrt(var + self.eps)
            if self.affine:
                weight = self.param("weight", nn.initializers.ones, (self.features,))
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
                y = y * weight + bias
            return y.reshape(x.shape).astype(x.dtype)
        mu = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=(1, 2), keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * weight + bias
        return y.astype(x.dtype)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Integer-factor nearest upsampling == torch interpolate(mode='nearest')."""
    if factor == 1:
        return x
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)
