"""Fully-fused Pallas kernel for one Restormer TransformerBlock.

Why: profiled on v5e, the XLA lowering of a block (restormer.py
TransformerBlock) spends most of its time in kernel-boundary overhead and
lane-retiling of small-C tensors — a block at 256^2x48 costs ~1.1 ms while
its ideal HBM traffic is ~100 us. This kernel runs the whole block —

  LN1 -> qkv 1x1 -> 3x3 depthwise -> channel attention -> project ->
  residual -> LN2 -> GDFN (1x1 expand -> 3x3 depthwise -> exact-GELU gate
  -> 1x1 project) -> residual

— in two passes over row tiles of the image:

  phase 0: stream rows, recompute q/k, accumulate per-head Gram matrix
           G[c,d] = sum_l q[l,c] k[l,d] and squared norms (the reference's
           pre-softmax L2 normalization is a per-channel scalar, so it
           factors out of G); at the last tile, softmax -> A (heads,hc,hc)
  phase 1: stream rows again, recompute qkv, apply A, finish the block,
           write the output rows

HBM traffic per block: ~2 reads of x + 1 write of out (plus weights),
instead of dozens of intermediate round trips.

Halo handling: two nested 3x3 depthwise convs need a 2-row halo. Rather
than overlapped reads (Mosaic rejects lane-unaligned manual DMA slices for
C<128), the grid runs one tile ahead and a VMEM scratch ring carries the
previous tile plus two rows of the tile before it; image-boundary halo
rows are zeroed to reproduce the convs' zero padding, and rows past the
real H are masked out of the attention statistics. All accumulation is
float32. Restrictions (matching every released Restormer config):
bias-free convs. Both LayerNorm variants are supported.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """float32 erf (A&S 7.1.26 rational approx, |err| < 1.5e-7 — below
    float32 resolution for GELU). Pallas TPU has no erf primitive."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x.astype(jnp.float32) / np.sqrt(2.0)))


def _gelu_sigmoid(x):
    """Sigmoid-form GELU approximation (|err| <= 0.02 near |x|~2): ~5 VPU
    ops versus ~12 for the rational-erf exact form. Serving-mode only —
    the deviation is of the same order as the mode's bf16 matmul rounding
    and is folded into the quantified deltas of validate_serving.py."""
    x = x.astype(jnp.float32)
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x, w, b, subtract_mean: bool, one_pass: bool = False):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if one_pass:
        # serving mode: var = E[x^2] - mu^2 saves a full (x - mu) pass;
        # catastrophic cancellation is bounded because LN inputs are O(1)
        # activations, and the result feeds bf16 matmuls anyway
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0
        )
    else:
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    base = (x32 - mu) if subtract_mean else x32
    return base * jax.lax.rsqrt(var + 1e-5) * w + b


def _group_mean(x32, pack: int, C: int):
    """Per-lane-group mean: lanes [g*C, (g+1)*C) share group g's mean.

    Used by the lane-packed mode, where ``pack`` images ride side by side
    in the lane dim and LayerNorm statistics must not mix images. The last
    group's sum comes free as (total - others), so pack-1 masked reductions
    suffice."""
    li = jax.lax.broadcasted_iota(jnp.int32, x32.shape, x32.ndim - 1)
    rem = jnp.sum(x32, axis=-1, keepdims=True)
    parts = []
    for g in range(pack - 1):
        m = jnp.logical_and(li >= g * C, li < (g + 1) * C)
        sg = jnp.sum(jnp.where(m, x32, 0.0), axis=-1, keepdims=True)
        rem = rem - sg
        parts.append((m, sg))
    out = rem
    for m, sg in parts:
        out = jnp.where(m, sg, out)
    return out / C


def _ln_packed(x, w, b, subtract_mean: bool, pack: int, C: int):
    """LayerNorm with per-image statistics in the lane-packed layout.
    Same formula as _ln (mean of squared deviations), per channel group."""
    x32 = x.astype(jnp.float32)
    mu = _group_mean(x32, pack, C)
    var = _group_mean((x32 - mu) ** 2, pack, C)
    base = (x32 - mu) if subtract_mean else x32
    return base * jax.lax.rsqrt(var + 1e-5) * w + b


def _dwconv(t, w9):
    """t: (R, W, K) float32, w9: (9, K). Valid rows only: out (R-2, W, K).

    Row offsets are free (static sublane addressing), column shifts move
    data — so accumulate over the 3 rows per column-tap first and shift
    only the 3 accumulated planes (2 shifted copies of (R-2, W, K) instead
    of 6)."""
    R, W, K = t.shape
    r0, r1, r2 = t[0 : R - 2], t[1 : R - 1], t[2:R]
    acc = [r0 * w9[dj] + r1 * w9[3 + dj] + r2 * w9[6 + dj] for dj in range(3)]
    zcol = jnp.zeros((R - 2, 1, K), jnp.float32)
    # out[:, j] = acc0[:, j-1] + acc1[:, j] + acc2[:, j+1]
    return (
        acc[1]
        + jnp.concatenate([zcol, acc[0][:, :-1]], axis=1)
        + jnp.concatenate([acc[2][:, 1:], zcol], axis=1)
    )


def _make_kernel(RT: int, W: int, C: int, heads: int, hidden: int,
                 H_real: int, ln_bias: bool, out_dtype, mm_bf16: bool,
                 fast_gelu: bool = False, pack: int = 1,
                 batch_inner: bool = False):
    """``C``/``hidden`` are PER-IMAGE sizes; with ``pack`` > 1 the kernel
    operates on ``pack`` images side by side in the lane dim (Ck = pack*C
    lanes) against block-diagonal weights — one MXU/VPU pass covers all
    packed images, lifting lane utilization when C << 128 (e.g. Restormer
    level-1 C=48 leaves 62% of the 128-lane tile idle unpacked)."""
    hc = C // heads
    Ck = pack * C
    hk = pack * hidden
    _gelu = _gelu_sigmoid if fast_gelu else _gelu_exact

    def _lnrm(x, w, b):
        if pack == 1:
            return _ln(x, w, b, ln_bias, one_pass=mm_bf16)
        return _ln_packed(x, w, b, ln_bias, pack, C)

    if mm_bf16:
        # serving mode: single-pass bf16 MXU matmuls with float32 accumulation
        def _mm(a, b, dims):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), (dims, ((), ())),
                preferred_element_type=jnp.float32,
                # explicit DEFAULT: an outer default_matmul_precision
                # ("float32") pin (engine parity mode) must not force
                # HIGHEST onto bf16 operands (Mosaic: "Bad lhs type")
                precision=jax.lax.Precision.DEFAULT,
            )
    else:
        # parity mode: true-float32 (6-pass) matmuls
        def _mm(a, b, dims):
            return jax.lax.dot_general(
                a, b, (dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    def kernel(x_ref, w_qk, dw_qk, w_v, dw_v, temp, w_proj, ln1, ln2, w_fin,
               dw_fin, w_fout, out_ref, prev_tile, pp_rows, g_acc, qs_acc,
               ks_acc, attn):
        # batch_inner: grid (2, n_rt, Bk) — consecutive steps process
        # DIFFERENT images, so the ring/stat dependency sits Bk steps
        # apart and Mosaic could in principle overlap image b's MXU work
        # with image b''s VPU chain (per-image scratch slots). Measured
        # perf-NEUTRAL on v5e (83.4 vs 83.5 ms, Restormer@256 b=8):
        # Mosaic executes grid steps serially and only pipelines the
        # copies, so within-step MXU+VPU serialization is structural.
        # Kept as a tested option; default: batch-outer grid
        # (Bk, 2, n_rt), slot 0.
        if batch_inner:
            ph = pl.program_id(0)
            rt = pl.program_id(1)
            sl = pl.program_id(2)
            n_rt = pl.num_programs(1)  # = n_tiles + 1 (one-tile lag)
        else:
            ph = pl.program_id(1)
            rt = pl.program_id(2)
            sl = 0
            n_rt = pl.num_programs(2)  # = n_tiles + 1 (one-tile lag)

        fresh = x_ref[0].astype(jnp.float32)  # tile rt (clamped at the end)

        @pl.when(rt == 0)
        def _seed():
            # top halo of tile 0 is the conv zero padding
            pp_rows[sl] = jnp.zeros_like(pp_rows[sl])
            prev_tile[sl] = fresh.astype(prev_tile.dtype)

        @pl.when(jnp.logical_and(ph == 0, rt == 0))
        def _reset():
            g_acc[sl] = jnp.zeros_like(g_acc[sl])
            qs_acc[sl] = jnp.zeros_like(qs_acc[sl])
            ks_acc[sl] = jnp.zeros_like(ks_acc[sl])

        @pl.when(rt > 0)
        def _compute():
            T = rt - 1  # output tile index
            bot = jnp.where(rt == n_rt - 1, 0.0, 1.0) * fresh[:2]
            x_t = jnp.concatenate(
                [pp_rows[sl].astype(jnp.float32),
                 prev_tile[sl].astype(jnp.float32), bot], axis=0
            )  # (RT+4, W, Ck); row j <-> real row T*RT + j - 2

            y = _lnrm(x_t, ln1[0], ln1[1])
            # rows outside the real image must be exactly the dwconv's zero
            # padding (phantom rows pick up values through LN bias otherwise)
            jrow = jax.lax.broadcasted_iota(jnp.int32, (RT + 4, 1, 1), 0)
            real_j = T * RT + jrow - 2
            row_ok = jnp.logical_and(real_j >= 0, real_j < H_real).astype(
                jnp.float32
            )

            # phase 0 only needs q,k (attention stats); phase 1 only needs v
            # — splitting the projection halves the qkv matmul+dwconv work
            # versus recomputing all three in both passes. (A variant that
            # ring-carried the projected rows to avoid the 4/RT halo
            # recompute measured perf-neutral at model level — the kernel
            # is bound by intra-instance serialization, not matmul count —
            # so the simpler halo recompute stays.)
            @pl.when(ph == 0)
            def _stats():
                qk = _mm(
                    y.reshape(-1, Ck), w_qk[:], ((1,), (0,))
                ).reshape(RT + 4, W, 2 * Ck) * row_ok
                dqk = _dwconv(qk, dw_qk[:])  # (RT+2, W, 2Ck)
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (RT, W, 1), 0)
                mask = (T * RT + row_ids < H_real).astype(jnp.float32)
                qf = (dqk[1 : RT + 1, :, :Ck] * mask).reshape(-1, Ck)
                kf = (dqk[1 : RT + 1, :, Ck:] * mask).reshape(-1, Ck)
                if pack == 1:
                    for h in range(heads):
                        qh = qf[:, h * hc : (h + 1) * hc]
                        kh = kf[:, h * hc : (h + 1) * hc]
                        g_acc[sl, h] += _mm(qh, kh, ((0,), (0,)))
                        qs_acc[sl, h] += jnp.sum(qh * qh, axis=0, keepdims=True)
                        ks_acc[sl, h] += jnp.sum(kh * kh, axis=0, keepdims=True)
                else:
                    # one full Ck x Ck Gram holds every (image, head) diag
                    # block at once (cross-image/head blocks are unused)
                    g_acc[sl, 0] += _mm(qf, kf, ((0,), (0,)))
                    qs_acc[sl, 0] += jnp.sum(qf * qf, axis=0, keepdims=True)
                    ks_acc[sl, 0] += jnp.sum(kf * kf, axis=0, keepdims=True)

            @pl.when(jnp.logical_and(ph == 0, rt == n_rt - 1))
            def _finalize():
                if pack == 1:
                    for h in range(heads):
                        qn = jnp.maximum(jnp.sqrt(qs_acc[sl, h][0]), 1e-12)
                        kn = jnp.maximum(jnp.sqrt(ks_acc[sl, h][0]), 1e-12)
                        logits = g_acc[sl, h] / qn[:, None] / kn[None, :] * temp[0, h]
                        attn[sl, h] = jax.nn.softmax(logits, axis=-1)
                else:
                    qn = jnp.maximum(jnp.sqrt(qs_acc[sl, 0][0]), 1e-12)
                    kn = jnp.maximum(jnp.sqrt(ks_acc[sl, 0][0]), 1e-12)
                    attn[sl, 0] = jnp.zeros((Ck, Ck), jnp.float32)
                    for i in range(pack):
                        for h in range(heads):
                            s = i * C + h * hc
                            e = s + hc
                            logits = (
                                g_acc[sl, 0][s:e, s:e]
                                / qn[s:e][:, None] / kn[s:e][None, :]
                                * temp[0, h]
                            )
                            attn[sl, 0, s:e, s:e] = jax.nn.softmax(logits, axis=-1)

            @pl.when(ph == 1)
            def _apply():
                v = _mm(
                    y.reshape(-1, Ck), w_v[:], ((1,), (0,))
                ).reshape(RT + 4, W, Ck) * row_ok
                vf = _dwconv(v, dw_v[:]).reshape(-1, Ck)  # (RT+2)*W rows
                if pack == 1:
                    outs = []
                    for h in range(heads):
                        vh = vf[:, h * hc : (h + 1) * hc]
                        outs.append(_mm(vh, attn[sl, h], ((1,), (1,))))
                    ao = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)
                else:
                    # block-diagonal attention matrix: one matmul applies
                    # every (image, head) attention at once
                    ao = _mm(vf, attn[sl, 0], ((1,), (1,)))
                ao = _mm(ao, w_proj[:], ((1,), (0,))).reshape(RT + 2, W, Ck)
                x2 = x_t[1 : RT + 3] + ao  # residual 1 (rows <-> dqk rows)

                y2 = _lnrm(x2, ln2[0], ln2[1])
                h1 = _mm(
                    y2.reshape(-1, Ck), w_fin[:], ((1,), (0,))
                ).reshape(RT + 2, W, 2 * hk)
                irow = jax.lax.broadcasted_iota(jnp.int32, (RT + 2, 1, 1), 0)
                real_i = T * RT + irow - 1
                h1 = h1 * jnp.logical_and(
                    real_i >= 0, real_i < H_real
                ).astype(jnp.float32)
                hd = _dwconv(h1, dw_fin[:])  # (RT, W, 2*hk)
                gated = _gelu(hd[:, :, :hk]) * hd[:, :, hk:]
                out_t = _mm(
                    gated.reshape(-1, hk), w_fout[:], ((1,), (0,))
                ).reshape(RT, W, Ck)
                out_ref[0] = (x2[1 : RT + 1] + out_t).astype(out_dtype)

        @pl.when(jnp.logical_and(rt == 0, ph == 1))
        def _zero_first():
            out_ref[0] = jnp.zeros((RT, W, Ck), out_dtype)

        # advance the ring (after compute): keep tile rt and its last 2 rows
        @pl.when(rt > 0)
        def _advance():
            pp_rows[sl] = prev_tile[sl, RT - 2 :]
            prev_tile[sl] = fresh.astype(prev_tile.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("heads", "ln_bias", "row_tile", "mm_bf16", "fast_gelu",
                     "lane_pack", "batch_inner", "interpret"),
)
def fused_transformer_block(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    heads: int,
    ln_bias: bool,
    row_tile: int = 8,
    mm_bf16: bool = False,
    fast_gelu: bool = False,
    lane_pack: int = 1,
    batch_inner: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, C). p holds the converted TransformerBlock params:
    norm1/norm2 {weight[,bias]}, attn {qkv, qkv_dwconv, project_out,
    temperature}, ffn {project_in, dwconv, project_out} (bias-free convs).

    ``mm_bf16=True`` is the serving-precision mode: matmuls run as
    single-pass bf16 MXU ops with float32 accumulation (LN, softmax,
    residuals, and depthwise convs stay float32). Default is the parity
    mode (true-float32 matmuls).

    ``lane_pack=p`` runs p images side by side in the lane dim against
    block-diagonal weights (requires B % p == 0; sensible when p*C <= 128).
    Math is identical per image — LN statistics are grouped, attention is a
    block-diagonal matrix, GDFN weights are laid out per image.
    """
    B, H, W, C = x.shape
    hidden = p["ffn"]["project_in"]["kernel"].shape[-1] // 2
    pk = lane_pack
    if pk > 1 and B % pk:
        raise ValueError(f"lane_pack={pk} requires batch % pack == 0; got B={B}")
    RT = row_tile
    Hp = H + ((-H) % RT)
    n_tiles = Hp // RT
    xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))

    if pk > 1:
        # pack pk images into lanes: (B, Hp, W, C) -> (B/pk, Hp, W, pk*C)
        xp = xp.reshape(B // pk, pk, Hp, W, C).transpose(0, 2, 3, 1, 4)
        xp = xp.reshape(B // pk, Hp, W, pk * C)

    def _blkdiag(w):
        if pk == 1:
            return w
        return jax.scipy.linalg.block_diag(*([w] * pk))

    def _lanetile(w):  # (9, c) depthwise taps -> (9, pk*c)
        return w if pk == 1 else jnp.tile(w, (1, pk))

    def ln_pack(d):
        w = d["weight"].astype(jnp.float32)
        b = d.get("bias")
        b = jnp.zeros_like(w) if b is None else b.astype(jnp.float32)
        if pk > 1:
            w, b = jnp.tile(w, pk), jnp.tile(b, pk)
        return jnp.stack([w, b])

    w_qkv = p["attn"]["qkv"]["kernel"].reshape(C, 3 * C)
    dw_qkv = p["attn"]["qkv_dwconv"]["kernel"].reshape(9, 3 * C)
    # output channels are ordered [q | k | v] (torch qkv.chunk(3, dim=1));
    # packed layout per projection: [proj_img0 | proj_img1 | ...]
    w_qk = jnp.concatenate(
        [_blkdiag(w_qkv[:, :C]), _blkdiag(w_qkv[:, C : 2 * C])], axis=1
    )
    w_v = _blkdiag(w_qkv[:, 2 * C :])
    dw_qk = jnp.concatenate(
        [_lanetile(dw_qkv[:, :C]), _lanetile(dw_qkv[:, C : 2 * C])], axis=1
    )
    dw_v = _lanetile(dw_qkv[:, 2 * C :])
    w_proj = _blkdiag(p["attn"]["project_out"]["kernel"].reshape(C, C))
    temp = p["attn"]["temperature"].reshape(1, heads).astype(jnp.float32)
    w_fin_full = p["ffn"]["project_in"]["kernel"].reshape(C, 2 * hidden)
    w_fin = jnp.concatenate(
        [_blkdiag(w_fin_full[:, :hidden]), _blkdiag(w_fin_full[:, hidden:])],
        axis=1,
    )
    dw_fin_full = p["ffn"]["dwconv"]["kernel"].reshape(9, 2 * hidden)
    dw_fin = jnp.concatenate(
        [_lanetile(dw_fin_full[:, :hidden]), _lanetile(dw_fin_full[:, hidden:])],
        axis=1,
    )
    w_fout = _blkdiag(p["ffn"]["project_out"]["kernel"].reshape(hidden, C))

    kernel = _make_kernel(RT, W, C, heads, hidden, H, ln_bias, x.dtype,
                          mm_bf16, fast_gelu, pack=pk,
                          batch_inner=batch_inner)
    hc = C // heads
    Ck = pk * C
    hk = pk * hidden
    Bk = B // pk
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    vmem = lambda shape: pl.BlockSpec(shape, lambda g0, g1, g2: tuple([0] * len(shape)))  # noqa: E731
    n_rt = n_tiles + 1  # one-tile lag
    # batch_inner: per-image scratch slots (consecutive grid steps touch
    # different images; see _make_kernel)
    SB = Bk if batch_inner else 1
    if pk == 1:
        stat_shapes = [
            pltpu.VMEM((SB, heads, hc, hc), jnp.float32),
            pltpu.VMEM((SB, heads, 1, hc), jnp.float32),
            pltpu.VMEM((SB, heads, 1, hc), jnp.float32),
            pltpu.VMEM((SB, heads, hc, hc), jnp.float32),
        ]
    else:
        stat_shapes = [
            pltpu.VMEM((SB, 1, Ck, Ck), jnp.float32),
            pltpu.VMEM((SB, 1, 1, Ck), jnp.float32),
            pltpu.VMEM((SB, 1, 1, Ck), jnp.float32),
            pltpu.VMEM((SB, 1, Ck, Ck), jnp.float32),
        ]

    if batch_inner:
        grid = (2, n_rt, Bk)
        in_idx = lambda ph, rt, b: (b, jnp.minimum(rt, n_rt - 2), 0, 0)  # noqa: E731
        out_idx = lambda ph, rt, b: (b, jnp.maximum(rt - 1, 0), 0, 0)  # noqa: E731
    else:
        grid = (Bk, 2, n_rt)
        in_idx = lambda b, ph, rt: (b, jnp.minimum(rt, n_rt - 2), 0, 0)  # noqa: E731
        out_idx = lambda b, ph, rt: (b, jnp.maximum(rt - 1, 0), 0, 0)  # noqa: E731

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, RT, W, Ck), in_idx),
            vmem((Ck, 2 * Ck)),
            vmem((9, 2 * Ck)),
            vmem((Ck, Ck)),
            vmem((9, Ck)),
            vmem((1, heads)),
            vmem((Ck, Ck)),
            vmem((2, Ck)),
            vmem((2, Ck)),
            vmem((Ck, 2 * hk)),
            vmem((9, 2 * hk)),
            vmem((hk, Ck)),
        ],
        out_specs=pl.BlockSpec((1, RT, W, Ck), out_idx),
        out_shape=jax.ShapeDtypeStruct((Bk, Hp, W, Ck), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((SB, RT, W, Ck), x.dtype),  # prev_tile
            pltpu.VMEM((SB, 2, W, Ck), x.dtype),  # pp_rows
        ] + stat_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp, w_qk.astype(mm_dtype if mm_bf16 else x.dtype),
        dw_qk.astype(jnp.float32),
        w_v.astype(mm_dtype if mm_bf16 else x.dtype),
        dw_v.astype(jnp.float32), temp,
        w_proj.astype(mm_dtype), ln_pack(p["norm1"]), ln_pack(p["norm2"]),
        w_fin.astype(mm_dtype), dw_fin.astype(jnp.float32),
        w_fout.astype(mm_dtype),
    )
    out = out[:, :H]
    if pk > 1:
        out = out.reshape(Bk, H, W, pk, C).transpose(0, 3, 1, 2, 4)
        out = out.reshape(B, H, W, C)
    return out
