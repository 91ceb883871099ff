"""Selective scan (Mamba S6 recurrence) as a blocked associative scan.

TPU-native replacement for the ``mamba_ssm`` CUDA kernel the reference hard-
imports (/root/reference/src/mair/basicsr/archs/mair_arch.py:10,266-272).
The recurrence over L tokens

    dt_t  = softplus(delta_t + delta_bias)
    h_t   = exp(dt_t * A) * h_{t-1} + (dt_t * B_t) * u_t      # per state n
    y_t   = C_t . h_t + D * u_t

is first-order linear, so it maps onto `lax.associative_scan` with the
combine rule (a2, b2) o (a1, b1) = (a2*a1, a2*b1 + b2). To keep memory
bounded (the naive formulation materializes (B, D, L, N) coefficients for
the whole sequence) the sequence is processed in chunks: a `lax.scan` walks
chunks carrying the (D, N) hidden state, and inside each chunk a log-depth
associative scan runs on the VPU. All math is float32, matching the CUDA
kernel's precision, which is what holds the 0.05 dB budget through 36
stacked scan layers.

Layouts are chosen TPU-style: time-major (L, D) blocks so the D axis (the
wide one) lands on lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def _scan_single(u, dt, A, Bm, Cm, chunk):
    """u, dt: (L, D); A: (D, N); Bm, Cm: (L, N) -> y: (L, D), all float32."""
    L, d = u.shape
    n = A.shape[1]
    pad = (-L) % chunk
    if pad:
        u = jnp.pad(u, ((0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, pad), (0, 0)))
        Cm = jnp.pad(Cm, ((0, pad), (0, 0)))
    nc = (L + pad) // chunk

    def body(h, xs):
        u_c, dt_c, B_c, C_c = xs  # (chunk, D), (chunk, D), (chunk, N), (chunk, N)
        a = jnp.exp(dt_c[:, :, None] * A[None])  # (chunk, D, N)
        b = (dt_c * u_c)[:, :, None] * B_c[:, None, :]
        A_cum, B_cum = jax.lax.associative_scan(_combine, (a, b), axis=0)
        hs = A_cum * h[None] + B_cum  # (chunk, D, N)
        y_c = jnp.einsum("cdn,cn->cd", hs, C_c, preferred_element_type=jnp.float32)
        return hs[-1], y_c

    h0 = jnp.zeros((d, n), jnp.float32)
    _, ys = jax.lax.scan(
        body,
        h0,
        (
            u.reshape(nc, chunk, d),
            dt.reshape(nc, chunk, d),
            Bm.reshape(nc, chunk, n),
            Cm.reshape(nc, chunk, n),
        ),
    )
    y = ys.reshape(nc * chunk, d)
    return y[:L] if pad else y


@partial(jax.jit, static_argnames=("delta_softplus", "chunk"))
def selective_scan(
    u: jnp.ndarray,  # (B, K, L, D)
    delta: jnp.ndarray,  # (B, K, L, D)
    A: jnp.ndarray,  # (K, D, N)  (already -exp(A_log))
    Bmat: jnp.ndarray,  # (B, K, L, N)
    Cmat: jnp.ndarray,  # (B, K, L, N)
    D: jnp.ndarray | None = None,  # (K, D)
    delta_bias: jnp.ndarray | None = None,  # (K, D)
    delta_softplus: bool = True,
    chunk: int = 256,
) -> jnp.ndarray:
    """Batched over (B, K) directions. Returns y: (B, K, L, D) float32."""
    u = u.astype(jnp.float32)
    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias[None, :, None, :].astype(jnp.float32)
    if delta_softplus:
        dt = jax.nn.softplus(dt)

    scan_k = jax.vmap(_scan_single, in_axes=(0, 0, 0, 0, 0, None))  # over K
    scan_bk = jax.vmap(scan_k, in_axes=(0, 0, None, 0, 0, None))  # over B
    y = scan_bk(
        u,
        dt,
        A.astype(jnp.float32),
        Bmat.astype(jnp.float32),
        Cmat.astype(jnp.float32),
        chunk,
    )
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, None, :] * u
    return y
