"""Fused Pallas kernel for Restormer's MDTA channel-attention core.

Motivation (profiled on v5e): the XLA lowering of MDTA spends ~95% of its
time in layout copies/reshapes around the small-C tensors. This kernel
streams the qkv activation exactly twice and writes the output once:

  pass 0 over L tiles:  G[c,d]   += q[l,c] * k[l,d]        (MXU)
                        qs[c]    += q[l,c]^2,  ks[d] += k[l,d]^2
  (the reference L2-normalizes q,k over L *before* the product, but the
   normalizer is a per-channel scalar, so it factors out of G)
  at the last tile:     A = softmax(G / max(|q|,eps) / max(|k|,eps) * T)
  pass 1 over L tiles:  out[l,c]  = sum_d A[c,d] * v[l,d]  (MXU)

All accumulation is float32; A is tiny (head_c x head_c). Grid is
(B*heads, 2 phases, L tiles); scratch carries G/A across the sequential
TPU grid. Matches tpuir.models.restormer.MDTA numerics (same eps
semantics as torch F.normalize: denominator max(||.||, 1e-12)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(temp_ref, qkv_ref, out_ref, g_acc, qs_acc, ks_acc, attn):
    phase = pl.program_id(1)
    lt = pl.program_id(2)
    n_lt = pl.num_programs(2)

    @pl.when(jnp.logical_and(phase == 0, lt == 0))
    def _reset():
        g_acc[:] = jnp.zeros_like(g_acc)
        qs_acc[:] = jnp.zeros_like(qs_acc)
        ks_acc[:] = jnp.zeros_like(ks_acc)

    @pl.when(phase == 0)
    def _pass0():
        q = qkv_ref[0, 0]  # (Lt, hc) — leading singletons only
        k = qkv_ref[1, 0]
        g_acc[:] += jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        qs_acc[:] += jnp.sum(
            q.astype(jnp.float32) ** 2, axis=0, keepdims=True
        )
        ks_acc[:] += jnp.sum(
            k.astype(jnp.float32) ** 2, axis=0, keepdims=True
        )

    @pl.when(jnp.logical_and(phase == 0, lt == n_lt - 1))
    def _finalize():
        eps = 1e-12
        qn = jnp.maximum(jnp.sqrt(qs_acc[0, :]), eps)  # (hc,)
        kn = jnp.maximum(jnp.sqrt(ks_acc[0, :]), eps)
        t = temp_ref[0, 0]
        logits = g_acc[:] / qn[:, None] / kn[None, :] * t
        attn[:] = jax.nn.softmax(logits, axis=-1)

    @pl.when(phase == 1)
    def _pass1():
        v = qkv_ref[2, 0]  # (Lt, hc)
        # out[l, c] = sum_d A[c, d] v[l, d] == v @ A^T
        out_ref[0, 0] = jax.lax.dot_general(
            v, attn[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "l_tile"))
def mdta_core(qkv: jnp.ndarray, temperature: jnp.ndarray, num_heads: int,
              l_tile: int = 512) -> jnp.ndarray:
    """qkv: (B, L, 3, heads, hc); temperature: (heads, 1, 1) ->
    out (B, L, heads, hc)."""
    b, L, three, heads, hc = qkv.shape
    assert three == 3 and heads == num_heads
    pad = (-L) % l_tile
    if pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    Lp = L + pad
    n_lt = Lp // l_tile

    # (3, B*heads, Lp, hc): one clean transpose here keeps all kernel-side
    # reshapes singleton-leading (Mosaic-friendly for bf16).
    qkv_r = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * heads, Lp, hc)

    temp = jnp.broadcast_to(
        temperature.reshape(1, heads, 1), (b, heads, 1)
    ).reshape(b * heads, 1).astype(jnp.float32)

    grid = (b * heads, 2, n_lt)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1), lambda bh, ph, lt: (bh, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (3, 1, l_tile, hc), lambda bh, ph, lt: (0, bh, lt, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, l_tile, hc), lambda bh, ph, lt: (0, bh, lt, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((1, b * heads, Lp, hc), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((hc, hc), jnp.float32),
            pltpu.VMEM((1, hc), jnp.float32),
            pltpu.VMEM((1, hc), jnp.float32),
            pltpu.VMEM((hc, hc), jnp.float32),
        ],
    )(temp, qkv_r)
    out = out.reshape(b, heads, Lp, hc).transpose(0, 2, 1, 3)
    return out[:, :L]


def mdta_core_reference(qkv, temperature, num_heads):
    """Pure-XLA semantics twin (used on CPU and for testing)."""
    b, L, three, heads, hc = qkv.shape
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, L, heads, hc)
    q = q * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True), 1e-24)
    ).astype(qkv.dtype)
    k = k * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(k.astype(jnp.float32) ** 2, axis=1, keepdims=True), 1e-24)
    ).astype(qkv.dtype)
    attn = jnp.einsum(
        "blhc,blhd->bhcd", q, k, preferred_element_type=jnp.float32
    ) * temperature.reshape(1, num_heads, 1, 1)
    attn = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhcd,blhd->blhc", attn, v, preferred_element_type=qkv.dtype)
