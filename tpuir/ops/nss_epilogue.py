"""Fused SSM-mixer epilogue: gated 4-direction combine + out_norm
LayerNorm + SiLU(z) gate + out_proj, one pass over the stripe kernel's
padded output buffers.

Replaces the XLA chain ``combine_halves -> TorchLayerNorm(out_norm) ->
y * silu(z) -> Dense(out_proj)`` (tpuir/models/mair.py SSMixer tail;
reference /root/reference/src/mair/basicsr/archs/mair_arch.py:287-294).
The kernel reads the four half-split direction buffers (kept padded by
``nss_scan_stripe_pre(..., keep_pad=True)`` — slicing them in XLA would
materialize four copies), the prologue's padded z, and writes the
(B, H, W, d_model) projection directly; the intermediate combined/normed
image never touches HBM.

Channel-padding invariants this relies on (all verified in tests): the
stripe kernel's padded output channels are exactly zero (zero-padded x /
weights propagate zeros through the scan), gates and LayerNorm weights
are zero-padded, so LayerNorm statistics over the full padded width
divided by the REAL ``d_inner`` equal the unpadded statistics, and the
padded rows of out_proj contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(RB: int, H: int, W: int, Dp: int, Di: int, Dm: int,
                 shift: bool, scan_len: int, serving: bool, out_dtype):
    half = scan_len // 2
    nbw = W // half
    nbh = H // half

    if serving:
        def _mm(a, b):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # explicit DEFAULT: immune to an outer f32 precision pin
                precision=jax.lax.Precision.DEFAULT,
            )
    else:
        def _mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    def _masks(idx, nb):
        """(from_L for j=0, from_L for j=1) over half-block index vector
        (same table as nss_stripe._half_block_masks)."""
        blk = idx // half
        if not shift:
            fwd = blk % 2 == 0
            return fwd, fwd
        odd = blk % 2 == 1
        edge = jnp.logical_or(blk == 0, blk == nb - 1)
        return jnp.logical_or(odd, edge), jnp.logical_and(
            odd, jnp.logical_not(edge)
        )

    def kernel(oL01, oR01, oL23, oR23, gates, z_ref, lnp, w_out,
               out_ref):
        r = pl.program_id(1)

        # x^T-frame buffers: valid half-blocks run along W (their first
        # spatial axis); select, then un-transpose (W, RB) -> (RB, W)
        iw = jax.lax.broadcasted_iota(jnp.int32, (W, 1, 1), 0)
        selw0, selw1 = _masks(iw, nbw)
        y01_0 = jnp.where(selw0, oL01[0, 0].astype(jnp.float32),
                          oR01[0, 0].astype(jnp.float32))
        y01_1 = jnp.where(selw1, oL01[0, 1].astype(jnp.float32),
                          oR01[0, 1].astype(jnp.float32))
        y01_0 = jnp.transpose(y01_0, (1, 0, 2))
        y01_1 = jnp.transpose(y01_1, (1, 0, 2))

        # x-frame buffers: valid half-blocks run along H (global rows)
        ih = jax.lax.broadcasted_iota(jnp.int32, (RB, 1, 1), 0) + r * RB
        selh0, selh1 = _masks(ih, nbh)
        y23_0 = jnp.where(selh0, oL23[0, 0].astype(jnp.float32),
                          oR23[0, 0].astype(jnp.float32))
        y23_1 = jnp.where(selh1, oL23[0, 1].astype(jnp.float32),
                          oR23[0, 1].astype(jnp.float32))

        g = gates[0].astype(jnp.float32)  # (4, Dp); padded lanes zero
        y = (y01_0 * g[0] + y01_1 * g[1]
             + y23_0 * g[2] + y23_1 * g[3])  # (RB, W, Dp)

        # out_norm over the REAL Di channels (padded lanes are zero, so
        # full-width sums / Di are the unpadded statistics)
        mu = jnp.sum(y, axis=-1, keepdims=True) * (1.0 / Di)
        if serving:
            var = jnp.maximum(
                jnp.sum(y * y, axis=-1, keepdims=True) * (1.0 / Di)
                - mu * mu, 0.0,
            )
        else:
            # parity: mean of squared deviations over the real channels;
            # padded lanes contribute mu^2 each, subtracted exactly
            dev = jnp.sum((y - mu) ** 2, axis=-1, keepdims=True)
            var = (dev - (Dp - Di) * mu * mu) * (1.0 / Di)
        yn = (y - mu) * jax.lax.rsqrt(var + 1e-5) * lnp[0, 0] + lnp[0, 1]

        zz = z_ref[0].astype(jnp.float32)
        gated = yn * (zz * jax.nn.sigmoid(zz))  # padded lanes: 0 * 0
        out = _mm(gated.reshape(-1, Dp), w_out[:]).reshape(RB, W, Dm)
        out_ref[0] = out.astype(out_dtype)

    return kernel


def _pick_row_block(H, W, Dp, Dm, serving, row_block):
    """Rows per grid step, bounded by a dtype-aware VMEM model (like
    nss_prologue._pick_row_block): the 4 direction buffers (2 halves
    each) + z stream in at the stripe kernel's io dtype (f32 in parity
    mode, bf16 serving) and are pipeline double-buffered, plus ~4 f32
    compute planes and the output rows — at 128px/RB=32 the f32 path
    measures 103.0 MB vs a 101.6 MB limit, so the bound must scale with
    io bytes (regression: tests/test_nss_epilogue.py)."""
    RB = min(row_block, H)
    while H % RB:
        RB //= 2
    io_b = 2 if serving else 4

    def est(rb):
        return rb * W * (Dp * (8 * io_b * 2 + io_b * 2 + 4 * 4)
                         + Dm * io_b * 2)

    while RB > 8 and est(RB) > 90e6 and H % (RB // 2) == 0:
        RB //= 2
    return RB


def _forward(oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out,
             d_inner, shift, scan_len, serving, interpret, row_block):
    B, _, W, H, Dp = oL01.shape
    Di = d_inner
    Dm = w_out.shape[-1]
    dp = Dp - Di
    out_dtype = jnp.float32

    RB = _pick_row_block(H, W, Dp, Dm, serving, row_block)
    NR = H // RB

    gates_p = jnp.pad(gates.astype(jnp.float32), ((0, 0), (0, 0), (0, dp)))
    lnp = jnp.stack([
        jnp.pad(ln_w.astype(jnp.float32), (0, dp)),
        jnp.pad(ln_b.astype(jnp.float32), (0, dp)),
    ])[None]
    w_out_p = jnp.pad(w_out.astype(jnp.float32), ((0, dp), (0, 0)))

    kernel = _make_kernel(RB, H, W, Dp, Di, Dm, shift, scan_len, serving,
                          out_dtype)
    xT_spec = pl.BlockSpec((1, 2, W, RB, Dp), lambda b, r: (b, 0, 0, r, 0))
    x_spec = pl.BlockSpec((1, 2, RB, W, Dp), lambda b, r: (b, 0, r, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(B, NR),
        in_specs=[
            xT_spec, xT_spec, x_spec, x_spec,
            pl.BlockSpec((1, 4, Dp), lambda b, r: (b, 0, 0)),
            pl.BlockSpec((1, RB, W, Dp), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((1, 2, Dp), lambda b, r: (0, 0, 0)),
            pl.BlockSpec((Dp, Dm), lambda b, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, RB, W, Dm), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Dm), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(oL01, oR01, oL23, oR23, gates_p, z, lnp, w_out_p)
    return out


def _reference(oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out,
               d_inner, shift, scan_len):
    """XLA composition (backward + test oracle): combine_halves + the
    SSMixer tail (models/mair.py), on the padded buffers."""
    from tpuir.ops.nss_stripe import combine_halves

    Di = d_inner
    y = combine_halves(oL01[..., :Di], oR01[..., :Di], oL23[..., :Di],
                       oR23[..., :Di], gates, shift, scan_len)
    y32 = y.astype(jnp.float32)
    mu = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean((y32 - mu) ** 2, axis=-1, keepdims=True)
    yn = (y32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln_w.astype(jnp.float32) \
        + ln_b.astype(jnp.float32)
    zz = z[..., :Di].astype(jnp.float32)
    gated = yn * (zz * jax.nn.sigmoid(zz))
    return jnp.einsum("bhwc,cd->bhwd", gated,
                      w_out[:Di].astype(jnp.float32),
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _epilogue_vjp(oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out,
                  d_inner, shift, scan_len, serving, interpret, row_block):
    return _forward(oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out,
                    d_inner, shift, scan_len, serving, interpret, row_block)


def _epilogue_fwd(oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out,
                  d_inner, shift, scan_len, serving, interpret, row_block):
    out = _forward(oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out,
                   d_inner, shift, scan_len, serving, interpret, row_block)
    return out, (oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out)


def _epilogue_bwd(d_inner, shift, scan_len, serving, interpret, row_block,
                  res, g):
    oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out = res

    def ref(*args):
        return _reference(*args, d_inner, shift, scan_len)

    _, vjp = jax.vjp(ref, oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b,
                     w_out)
    return vjp(g.astype(jnp.float32))


_epilogue_vjp.defvjp(_epilogue_fwd, _epilogue_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("d_inner", "shift", "scan_len", "serving",
                     "interpret", "row_block"),
)
def mixer_epilogue(
    oL01: jnp.ndarray,  # (B, 2, W, H, Dp) x^T frame, keep_pad buffers
    oR01: jnp.ndarray,
    oL23: jnp.ndarray,  # (B, 2, H, W, Dp) x frame
    oR23: jnp.ndarray,
    gates: jnp.ndarray,  # (B, 4, d_inner) sigmoid gate values
    z: jnp.ndarray,  # (B, H, W, Dp) padded gate half (prologue output)
    ln_w: jnp.ndarray,  # (d_inner,) out_norm weight
    ln_b: jnp.ndarray,  # (d_inner,) out_norm bias
    w_out: jnp.ndarray,  # (d_inner, d_model) out_proj kernel
    d_inner: int,
    shift: bool = False,
    scan_len: int = 4,
    serving: bool = False,
    interpret: bool = False,
    row_block: int = 32,
):
    """Returns (B, H, W, d_model) float32 = out_proj(out_norm(gated
    4-direction combine) * silu(z))."""
    B, _, W, H, Dp = oL01.shape
    if gates.shape[-1] != d_inner:
        raise ValueError(f"gates must be (B, 4, d_inner); got {gates.shape}")
    if z.shape != (B, H, W, Dp):
        raise ValueError(f"z must be (B, H, W, {Dp}); got {z.shape}")
    return _epilogue_vjp(oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b,
                         w_out, d_inner, shift, scan_len, serving,
                         interpret, row_block)
