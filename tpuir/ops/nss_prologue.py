"""Fused SSM-mixer prologue: in_proj + 3x3 depthwise + SiLU + channel pad
+ transpose, one pass over the image.

The stripe NSS kernel (tpuir/ops/nss_stripe.py) consumes the post-dwconv
activations twice in each frame (xp natural-layout, xpT transposed). The
XLA composition that produces them costs one HBM round trip per step —
in_proj writes xz, the depthwise conv re-reads/writes x_, the pad and the
transpose each re-read/write again — and XLA's NHWC depthwise conv at
C=234 is lane-inefficient. This kernel streams row blocks of the post-LN
activations once and emits all three consumers directly:

  xz = h @ W_in                (MXU; z half sliced from the block rows)
  x_ = silu(dwconv3x3(xz[:Di]) + b)   (9 static-shift FMAs in VMEM)
  xp  (B, H, W, Dp)   io-dtype, channel-padded for the stripe kernel
  xpT (B, W, H, Dp)   transposed in VMEM (major-dims relayout)
  z   (B, H, W, Dp)   the gate half, untouched by the conv (padded so
                      the fused epilogue reads it without an XLA pad)

Per mixer, HBM sees: 1 read of h + the three output writes — instead of
~5 intermediate round trips (measured as the bulk of the ~9.5 ms/model
"mixer glue" bucket, benchmarks/decomp_mair2.py).

Matches /root/reference/src/mair/basicsr/archs/mair_arch.py:277-284
(in_proj, chunk, conv2d, SiLU) and the identical LoSh2D prologue
(mairunet_arch.py:216-224). Backward falls back to the XLA composition
(exact same math) via custom_vjp, like nss_stripe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(RB: int, W: int, Dmp: int, Di: int, Dp: int, H: int,
                 serving: bool, out_dtype):
    if serving:
        def _mm(a, b):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # explicit DEFAULT: an outer default_matmul_precision
                # ("float32") pin (engine parity mode) must not force
                # HIGHEST onto bf16 operands (Mosaic: "Bad lhs type")
                precision=jax.lax.Precision.DEFAULT,
            )
    else:
        def _mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    def kernel(h_ref, halo_ref, w_ref, wz_ref, k_ref, b_ref,
               xp_ref, xpT_ref, z_ref):
        # rows: [top halo, RB block rows, bottom halo] — halos are zeroed
        # by the host-side builder at the image boundary (the conv's zero
        # padding)
        x_t = jnp.concatenate(
            [halo_ref[0, 0, 0:1].astype(jnp.float32),
             h_ref[0].astype(jnp.float32),
             halo_ref[0, 0, 1:2].astype(jnp.float32)], axis=0
        )  # (RB + 2, W, Dmp)
        xz = _mm(x_t.reshape(-1, Dmp), w_ref[:]).reshape(RB + 2, W, Dp)

        # depthwise 3x3, zero column padding; row offsets are static
        # sublane addressing (same scheme as ops/fused_block.py:_dwconv)
        k9 = k_ref[:]  # (9, Dp)
        c0, c1, c2 = xz[0:RB], xz[1 : RB + 1], xz[2 : RB + 2]
        acc = [c0 * k9[dj] + c1 * k9[3 + dj] + c2 * k9[6 + dj]
               for dj in range(3)]
        zcol = jnp.zeros((RB, 1, Dp), jnp.float32)
        conv = (
            acc[1]
            + jnp.concatenate([zcol, acc[0][:, :-1]], axis=1)
            + jnp.concatenate([acc[2][:, 1:], zcol], axis=1)
        ) + b_ref[0]
        x_ = conv * jax.nn.sigmoid(conv)  # SiLU; padded lanes stay 0
        # (weights/bias/taps are zero-padded to Dp, so sigmoid(0)*0 == 0)

        xp_ref[0] = x_.astype(out_dtype)
        xpT_ref[0] = jnp.transpose(x_, (1, 0, 2)).astype(out_dtype)
        zz = _mm(
            h_ref[0].astype(jnp.float32).reshape(-1, Dmp), wz_ref[:]
        ).reshape(RB, W, Dp)
        z_ref[0] = zz.astype(out_dtype)

    return kernel


def _pick_row_block(H, W, Dmp, Dp, serving, row_block):
    """Rows per grid step, bounded by a VMEM model of the compiler's
    scoped accounting: input rows at io dtype (pipeline double-buffered),
    the f32 compute planes (xz + 3 shifted acc + conv/x_), and the 3
    outputs at io dtype (double-buffered). The f32 parity path is ~2x the
    bf16 serving live set at the same RB — at 128px/RB=64 the compiler
    measures 102.9 MB f32 vs a 101.6 MB limit, so the bound must be
    dtype-aware (regression: tests/test_nss_prologue.py)."""
    RB = min(row_block, H)
    while H % RB:
        RB //= 2
    io_b = 2 if serving else 4

    def est(rb):
        pos = (rb + 2) * W
        return (pos * Dmp * io_b * 2
                + pos * Dp * 4 * 5
                + rb * W * Dp * io_b * 3 * 2)

    while RB > 8 and est(RB) > 90e6 and H % (RB // 2) == 0:
        RB //= 2
    return RB


def _forward(h, w_in, conv_k, conv_b, d_inner, serving, interpret,
             row_block):
    B, H, W, Dm = h.shape
    Di = d_inner
    dmp = (-Dm) % 128
    Dmp = Dm + dmp
    dp = (-Di) % 128
    Dp = Di + dp
    io_dtype = jnp.bfloat16 if serving else jnp.float32

    RB = _pick_row_block(H, W, Dmp, Dp, serving, row_block)
    NR = H // RB

    hp = jnp.pad(h.astype(io_dtype), ((0, 0), (0, 0), (0, 0), (0, dmp)))
    # halo rows per block: row above (zero at top) and row below (zero at
    # bottom) — a (B, NR, 2, W, Dmp) gather, tiny vs the image volume
    top = jnp.pad(hp[:, RB - 1 :: RB][:, : NR - 1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    bot = jnp.pad(hp[:, RB::RB], ((0, 0), (0, 1), (0, 0), (0, 0)))
    halo = jnp.stack([top, bot], axis=2)  # (B, NR, 2, W, Dmp)

    # in_proj weight (Dm, 2*Di), torch chunk order [x_ | z]
    w_x = jnp.pad(w_in[:, :Di].astype(jnp.float32), ((0, dmp), (0, dp)))
    w_z = jnp.pad(w_in[:, Di:].astype(jnp.float32), ((0, dmp), (0, dp)))
    k9 = jnp.pad(
        conv_k.reshape(9, Di).astype(jnp.float32), ((0, 0), (0, dp))
    )
    b_p = jnp.pad(conv_b.astype(jnp.float32), ((0, dp)))[None, None, :]

    kernel = _make_kernel(RB, W, Dmp, Di, Dp, H, serving, io_dtype)
    const = lambda shape: pl.BlockSpec(shape, lambda b, r: (0,) * len(shape))  # noqa: E731
    xp, xpT, z = pl.pallas_call(
        kernel,
        grid=(B, NR),
        in_specs=[
            pl.BlockSpec((1, RB, W, Dmp), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((1, 1, 2, W, Dmp), lambda b, r: (b, r, 0, 0, 0)),
            const((Dmp, Dp)),
            const((Dmp, Dp)),
            const((9, Dp)),
            const((1, 1, Dp)),
        ],
        out_specs=(
            pl.BlockSpec((1, RB, W, Dp), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((1, W, RB, Dp), lambda b, r: (b, 0, r, 0)),
            pl.BlockSpec((1, RB, W, Dp), lambda b, r: (b, r, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Dp), io_dtype),
            jax.ShapeDtypeStruct((B, W, H, Dp), io_dtype),
            jax.ShapeDtypeStruct((B, H, W, Dp), io_dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(hp, halo, w_x, w_z, k9, b_p)
    return xp, xpT, z


def _reference(h, w_in, conv_k, conv_b, d_inner):
    """XLA composition with identical math (backward + test oracle)."""
    B, H, W, Dm = h.shape
    Di = d_inner
    dp = (-Di) % 128
    h32 = h.astype(jnp.float32)
    xz = jnp.einsum("bhwc,cd->bhwd", h32, w_in.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    x_, z = xz[..., :Di], xz[..., Di:]
    x_ = jax.lax.conv_general_dilated(
        x_, conv_k.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=Di,
    ) + conv_b.astype(jnp.float32)
    x_ = x_ * jax.nn.sigmoid(x_)
    xp = jnp.pad(x_, ((0, 0), (0, 0), (0, 0), (0, dp)))
    zp = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (0, dp)))
    return xp, jnp.transpose(xp, (0, 2, 1, 3)), zp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _prologue_vjp(h, w_in, conv_k, conv_b, d_inner, serving, interpret,
                  row_block):
    return _forward(h, w_in, conv_k, conv_b, d_inner, serving, interpret,
                    row_block)


def _prologue_fwd(h, w_in, conv_k, conv_b, d_inner, serving, interpret,
                  row_block):
    out = _forward(h, w_in, conv_k, conv_b, d_inner, serving, interpret,
                   row_block)
    return out, (h, w_in, conv_k, conv_b)


def _prologue_bwd(d_inner, serving, interpret, row_block, res, g):
    h, w_in, conv_k, conv_b = res
    gxp, gxpT, gz = [t.astype(jnp.float32) for t in g]

    def ref(h, w_in, conv_k, conv_b):
        return _reference(h, w_in, conv_k, conv_b, d_inner)

    _, vjp = jax.vjp(ref, h, w_in, conv_k, conv_b)
    return vjp((gxp, gxpT, gz))


_prologue_vjp.defvjp(_prologue_fwd, _prologue_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("d_inner", "serving", "interpret", "row_block"),
)
def mixer_prologue(
    h: jnp.ndarray,  # (B, H, W, d_model) post-LN block input
    w_in: jnp.ndarray,  # (d_model, 2*d_inner) in_proj kernel, [x_ | z]
    conv_k: jnp.ndarray,  # (3, 3, 1, d_inner) depthwise HWIO kernel
    conv_b: jnp.ndarray,  # (d_inner,)
    d_inner: int,
    serving: bool = False,
    interpret: bool = False,
    row_block: int = 64,
):
    """Returns (xp (B,H,W,Dp), xpT (B,W,H,Dp), z (B,H,W,Dp)) with
    Dp = d_inner padded to the lane size — exactly the operands
    nss_scan_stripe's ``pre`` path consumes, plus the gate half (padded
    channels zero)."""
    if h.ndim != 4:
        raise ValueError(f"expected (B,H,W,C) input; got {h.shape}")
    if w_in.shape[-1] != 2 * d_inner:
        raise ValueError(
            f"in_proj kernel must be (d_model, 2*d_inner); got {w_in.shape}"
        )
    return _prologue_vjp(h, w_in, conv_k, conv_b, d_inner, serving,
                         interpret, row_block)
