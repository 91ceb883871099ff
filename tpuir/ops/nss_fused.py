"""Gather-free NSS selective scan (MaIR) for TPU.

Round-2's fused-projection kernel (tpuir/ops/scan_pallas.py) still paid
for the NSS permutations in HBM: ``jnp.take`` with 16k-entry index arrays
materialized the scanned sequences xs (B, K, L, D), and the inverse
permutation was another gather over the (B, K, L, D) output — ~15 ms of
the 100 ms MaIR-CDN@128 forward, dominated by the gather engine rather
than by bytes.

This module exploits the *structure* of the NSS path instead
(/root/reference/src/mair/basicsr/archs/shift_scanf_util.py:67-158): the
path consumes the image stripe by stripe — vertical stripes of width
``scan_len`` for directions 0/1, the same on the transposed image for
directions 2/3 — and within a stripe the permutation is a composition of
involutions: a vertical flip on alternating stripes, a boustrophedon
reversal of odd rows, and a 180-degree rotation for the reversed
directions. That makes the whole permutation expressible as
reshape/transpose/reverse/slice/concat — ordinary XLA copies that run at
HBM bandwidth and fuse with neighbours — instead of gathers (see
``_alt_flip`` for why select/where is deliberately NOT used):

  * forward: one fused XLA copy builds each direction pair's sequence
    tensor directly from the image (the producer silu/pad fuses in);
  * the Pallas kernel (the two-level vertical scan with fused
    projections, as in scan_pallas) runs over plain sequence chunks and
    additionally emits per-direction channel sums — the ShuffleAttn
    gate's pooled means are permutation-invariant, so the gate needs no
    inverse permutation at all;
  * inverse: the un-permute back to image layout is again
    reshape/reverse/transpose, which XLA fuses into the 4-direction
    gated-combine einsum's reads.

The shifted variant (odd MaIR blocks, shift = scan_len/2) has a narrow
lead stripe and a narrow tail stripe; the sequence is assembled from
lead/middle/tail pieces by one concat, so no pad tokens enter the
recurrence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Structured NSS permutation (pure XLA: reshape/transpose/reverse/select)
# ---------------------------------------------------------------------------


def _alt_flip(x, axis, flip_axis, flip_parity):
    """Reverse ``flip_axis`` on indices of ``axis`` with index % 2 ==
    flip_parity — implemented with slice/flip/concat ONLY.

    Deliberately avoids ``jnp.where(parity_mask, jnp.flip(x), x)``: that
    select pattern, fused into the producer of a Mosaic (pallas_call)
    operand whose input chain itself starts at a previous pallas_call's
    output, miscompiles on TPU — the kernel's first grid iterations read
    wrong data (observed max-abs ~2 on unit-scale inputs; the gather- and
    slice/concat-built sequences are correct under the identical kernel).
    """
    n = x.shape[axis]
    if n == 1:
        return jnp.flip(x, axis=flip_axis) if flip_parity == 0 else x
    if n % 2:
        # peel the final (even-index) element, pair up the rest
        head = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
        tail = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        if flip_parity == 0:
            tail = jnp.flip(tail, axis=flip_axis)
        return jnp.concatenate(
            [_alt_flip(head, axis, flip_axis, flip_parity), tail], axis=axis
        )
    shape = list(x.shape)
    shape[axis : axis + 1] = [n // 2, 2]
    xr = x.reshape(shape)
    fa = flip_axis + 1 if flip_axis > axis else flip_axis
    ev = jax.lax.slice_in_dim(xr, 0, 1, axis=axis + 1)
    od = jax.lax.slice_in_dim(xr, 1, 2, axis=axis + 1)
    if flip_parity == 0:
        ev = jnp.flip(ev, axis=fa)
    else:
        od = jnp.flip(od, axis=fa)
    return jnp.concatenate([ev, od], axis=axis + 1).reshape(x.shape)


def _bous(x, row_axis, col_axis):
    """Boustrophedon: reverse ``col_axis`` on odd indices of ``row_axis``."""
    return _alt_flip(x, row_axis, col_axis, flip_parity=1)


def _stripes_to_seq(x4, flip_parity):
    """x4: (B, S, H, SL, D) stripe-major blocks. Applies the alternating
    vertical flip (stripes with index % 2 == flip_parity run bottom-up),
    the boustrophedon, and flattens to (B, S*H*SL, D)."""
    B, S, H, SL, D = x4.shape
    x4 = _alt_flip(x4, axis=1, flip_axis=2, flip_parity=flip_parity)
    x4 = _bous(x4, row_axis=2, col_axis=3)
    return x4.reshape(B, S * H * SL, D)


def _seq_to_stripes(seq, S, H, SL, flip_parity):
    """Inverse of _stripes_to_seq."""
    B, _, D = seq.shape
    x4 = seq.reshape(B, S, H, SL, D)
    x4 = _bous(x4, row_axis=2, col_axis=3)
    return _alt_flip(x4, axis=1, flip_axis=2, flip_parity=flip_parity)


def _image_to_seq(x, scan_len, shift):
    """x: (B, H, W, D) -> NSS sequence (B, H*W, D) for the forward
    direction (k=0 on x; pass the 180-rotated / transposed image for the
    other directions). Mirrors _nss_flatten
    (/root/reference/src/mair/basicsr/archs/shift_scanf_util.py:37-64,
    re-derived in tpuir/ops/scan_ids.py)."""
    B, H, W, D = x.shape
    SL = scan_len
    half = SL // 2
    if not shift:
        S = W // SL
        x4 = x.reshape(B, H, S, SL, D).transpose(0, 2, 1, 3, 4)
        return _stripes_to_seq(x4, flip_parity=1)
    # shifted: narrow lead (never flipped), full stripes (EVEN indices
    # flipped), narrow tail (flipped iff its running index m is even)
    m = (W - SL) // SL  # number of full stripes
    lead = _bous(x[:, :, :half], row_axis=1, col_axis=2).reshape(B, H * half, D)
    mid4 = (
        x[:, :, half : W - half]
        .reshape(B, H, m, SL, D)
        .transpose(0, 2, 1, 3, 4)
    )
    mid = _stripes_to_seq(mid4, flip_parity=0)
    tail = x[:, :, W - half :]
    if m % 2 == 0:
        tail = jnp.flip(tail, axis=1)
    tail = _bous(tail, row_axis=1, col_axis=2).reshape(B, H * half, D)
    return jnp.concatenate([lead, mid, tail], axis=1)


def _seq_to_image(seq, H, W, scan_len, shift):
    """Inverse of _image_to_seq."""
    B, L, D = seq.shape
    SL = scan_len
    half = SL // 2
    if not shift:
        S = W // SL
        x4 = _seq_to_stripes(seq, S, H, SL, flip_parity=1)
        return x4.transpose(0, 2, 1, 3, 4).reshape(B, H, W, D)
    m = (W - SL) // SL
    nl = H * half
    lead = _bous(seq[:, :nl].reshape(B, H, half, D), row_axis=1, col_axis=2)
    mid4 = _seq_to_stripes(seq[:, nl : L - nl], m, H, SL, flip_parity=0)
    mid = mid4.transpose(0, 2, 1, 3, 4).reshape(B, H, W - SL, D)
    tail = _bous(seq[:, L - nl :].reshape(B, H, half, D), row_axis=1, col_axis=2)
    if m % 2 == 0:
        tail = jnp.flip(tail, axis=1)
    return jnp.concatenate([lead, mid, tail], axis=2)


def _rot180(x):
    return jnp.flip(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Pallas kernel: fused-projection vertical scan over sequence chunks, with
# per-direction pooled channel sums as a second (accumulated) output
# ---------------------------------------------------------------------------


def _make_kernel(chunk, n, r, d_tile, serving, P):
    S_ = chunk // P

    if serving:
        def _proj(x, w, dims):
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (dims, ((), ())), preferred_element_type=jnp.float32,
                # explicit DEFAULT: an outer default_matmul_precision
                # ("float32") pin (engine parity mode) must not force
                # HIGHEST onto bf16 operands (Mosaic: "Bad lhs type")
                precision=jax.lax.Precision.DEFAULT,
            )
    else:
        def _proj(x, w, dims):
            return jax.lax.dot_general(
                x, w, (dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    def kernel(xs_ref, wxp_ref, wdt_ref, A_ref, D_ref, bias_ref, y_ref,
               pool_ref, h_carry, HA, HB):
        lc = pl.program_id(1)

        @pl.when(lc == 0)
        def _reset():
            h_carry[:] = jnp.zeros_like(h_carry)

        xs = xs_ref[0].astype(jnp.float32)  # (chunk, Dp)
        xdbl = _proj(xs, wxp_ref[0], ((1,), (1,)))  # (chunk, R + 2N)
        dt_raw = _proj(xdbl[:, :r], wdt_ref[0], ((1,), (1,)))  # (chunk, Dp)
        Bc = xdbl[:, r : r + n]
        Cc = xdbl[:, r + n : r + 2 * n]
        dt = jax.nn.softplus(dt_raw + bias_ref[0])
        A = A_ref[0]  # (N, Dp)

        dt4 = dt.reshape(S_, P, d_tile)
        du4 = (dt * xs).reshape(S_, P, d_tile)
        B4 = Bc.reshape(S_, P, n)
        hA = hB = None
        for p in range(P):  # level 1: sequential over positions
            av = jnp.exp(dt4[:, p][:, None, :] * A[None])  # (S_, N, Dp)
            bv = B4[:, p][:, :, None] * du4[:, p][:, None, :]
            if p == 0:
                hA, hB = av, bv
            else:
                hA = av * hA
                hB = av * hB + bv
            HA[:, p] = hA
            HB[:, p] = hB

        c = h_carry[:]  # level 2: chain subchunk carries
        ces = []
        for ss in range(S_):
            ces.append(c)
            c = HA[ss, P - 1] * c + HB[ss, P - 1]
        h_carry[:] = c
        CE = jnp.stack(ces, axis=0)  # (S_, N, Dp)

        h_all = HA[:] * CE[:, None] + HB[:]  # (S_, P, N, Dp)
        y = jnp.sum(h_all * Cc.reshape(S_, P, n)[..., None], axis=2)
        y = y.reshape(chunk, d_tile) + D_ref[0] * xs  # f32
        y_ref[0] = y.astype(y_ref.dtype)

        # pooled channel sums (padded tail tokens have xs=0 => y=0, so no
        # masking is needed); broadcast into 8 sublanes for tile alignment
        psum = jnp.sum(y, axis=0, keepdims=True)  # (1, Dp)
        prev = jnp.where(lc == 0, jnp.zeros_like(psum), pool_ref[0, 0:1])
        pool_ref[0] = jnp.broadcast_to(prev + psum, (8, d_tile))

    return kernel


def _seq_scan_call(xs4, wxp, wdt, A2, D2, bias2, serving, vert_p, chunk,
                   interpret):
    """xs4: (B, K, L, Dp) sequence tensors, one per direction. ONE
    pallas_call covers all K directions (grid bk = b*K + k) — besides the
    launch amortization, two separate same-shaped calls were observed to
    collide on TPU (the second call's operands leaked into the first's
    results; merged, the direction index is explicit in the grid).
    Returns (y (B, K, L, Dp) io-dtype, pooled (B, K, Dp) f32)."""
    B, K, L, Dp = xs4.shape
    n = A2.shape[1]  # A2 is (K, N, Dp) — already transposed
    r = wxp.shape[1] - 2 * n
    lp = (-L) % chunk
    if lp:
        xs4 = jnp.pad(xs4, ((0, 0), (0, 0), (0, lp), (0, 0)))
    Lp = L + lp
    P = vert_p if chunk % vert_p == 0 else chunk
    out_dtype = jnp.bfloat16 if serving else jnp.float32

    y, pooled = pl.pallas_call(
        _make_kernel(chunk, n, r, Dp, serving, P),
        grid=(B * K, Lp // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, Dp),
                         lambda bk, lc: (bk, lc, 0)),
            pl.BlockSpec((1, r + 2 * n, Dp), lambda bk, lc: (bk % K, 0, 0)),
            pl.BlockSpec((1, Dp, r), lambda bk, lc: (bk % K, 0, 0)),
            pl.BlockSpec((1, n, Dp), lambda bk, lc: (bk % K, 0, 0)),
            pl.BlockSpec((1, 1, Dp), lambda bk, lc: (bk % K, 0, 0)),
            pl.BlockSpec((1, 1, Dp), lambda bk, lc: (bk % K, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, chunk, Dp), lambda bk, lc: (bk, lc, 0)),
            pl.BlockSpec((1, 8, Dp), lambda bk, lc: (bk, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * K, Lp, Dp), out_dtype),
            jax.ShapeDtypeStruct((B * K, 8, Dp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, Dp), jnp.float32),
            pltpu.VMEM((chunk // P, P, n, Dp), jnp.float32),
            pltpu.VMEM((chunk // P, P, n, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xs4.reshape(B * K, Lp, Dp), wxp, wdt, A2, D2[:, None], bias2[:, None]
    )
    return (
        y.reshape(B, K, Lp, Dp)[:, :, :L],
        pooled.reshape(B, K, 8, Dp)[:, :, 0],
    )


def _forward(x, x_proj_w, dt_w, A, D, delta_bias,
             scan_len, shift, serving, vert_p, chunk, interpret):
    B, H, W, d = x.shape
    dp = (-d) % 128
    Dp = d + dp
    n_state = A.shape[-1]
    # Bound the kernel's two (chunk/P, P, N, Dp) f32 carry scratches to what
    # fits VMEM comfortably (~50 MB, the largest shape round 2 shipped).
    # The deep MaIRUNet levels (Dp=768, N=32) blow past that at the default
    # chunk=512 and the remote TPU compiler hard-fails. Also never chunk
    # past the sequence itself: the latent level's L=256 would pad to 512
    # and double the scan work.
    l_cap = max(256, ((H * W + vert_p - 1) // vert_p) * vert_p)
    chunk = min(chunk, l_cap)
    while chunk > 256 and 8 * chunk * n_state * Dp > 50 * 1024 * 1024:
        chunk //= 2
    io_dtype = jnp.bfloat16 if serving else jnp.float32
    xp = jnp.pad(x.astype(io_dtype), ((0, 0), (0, 0), (0, 0), (0, dp)))
    wxp = jnp.pad(x_proj_w.astype(jnp.float32), ((0, 0), (0, 0), (0, dp)))
    wdt = jnp.pad(dt_w.astype(jnp.float32), ((0, 0), (0, dp), (0, 0)))
    A_p = jnp.pad(A.astype(jnp.float32), ((0, 0), (0, dp), (0, 0))).transpose(0, 2, 1)
    D_p = jnp.pad(D.astype(jnp.float32), ((0, 0), (0, dp)))
    bias_p = jnp.pad(delta_bias.astype(jnp.float32), ((0, 0), (0, dp)))

    # direction sequences: k=0 scans x, k=1 scans rot180(x), k=2/3 the same
    # on the transposed image (shift_scanf_util.py:130-158 sscan_4d)
    xT = jnp.transpose(xp, (0, 2, 1, 3))
    seq4 = jnp.stack(
        [_image_to_seq(xp, scan_len, shift),
         _image_to_seq(_rot180(xp), scan_len, shift),
         _image_to_seq(xT, scan_len, shift),
         _image_to_seq(_rot180(xT), scan_len, shift)], axis=1,
    )  # (B, 4, L, Dp)

    ys, pooled = _seq_scan_call(seq4, wxp, wdt, A_p, D_p, bias_p,
                                serving, vert_p, chunk, interpret)

    # un-permute to image layout (fuses into the caller's combine reads)
    y0 = _seq_to_image(ys[:, 0], H, W, scan_len, shift)
    y1 = _rot180(_seq_to_image(ys[:, 1], H, W, scan_len, shift))
    y2 = _seq_to_image(ys[:, 2], W, H, scan_len, shift)
    y3 = _rot180(_seq_to_image(ys[:, 3], W, H, scan_len, shift))
    y01 = jnp.stack([y0, y1], axis=1)[..., :d]
    y23 = jnp.stack([y2, y3], axis=1)[..., :d]
    pooled = pooled[:, :, :d]  # (B, 4, d)
    return y01, y23, pooled


def _reference(x, x_proj_w, dt_w, A, D, delta_bias, scan_len, shift):
    """Index-array composition with identical semantics (gather +
    projections + selective scan + inverse gather); the backward pass
    differentiates this."""
    from tpuir.ops.scan_ids import mair_scan_ids
    from tpuir.ops.selective_scan import selective_scan

    B, H, W, d = x.shape
    L = H * W
    ids, inv = mair_scan_ids(H, W, scan_len, scan_len // 2 if shift else 0)
    ids = jnp.asarray(ids)
    inv = jnp.asarray(inv)
    n = A.shape[-1]
    r = x_proj_w.shape[1] - 2 * n
    xf = x.reshape(B, L, d).astype(jnp.float32)
    xs = jnp.take(xf, ids, axis=1)  # (B, 4, L, d)
    xdbl = jnp.einsum("bkld,kcd->bklc", xs, x_proj_w,
                      preferred_element_type=jnp.float32)
    dts = jnp.einsum("bklr,kdr->bkld", xdbl[..., :r], dt_w,
                     preferred_element_type=jnp.float32)
    y = selective_scan(
        xs, dts, A, xdbl[..., r : r + n], xdbl[..., r + n :], D, delta_bias,
        delta_softplus=True, chunk=256,
    )  # (B, 4, L, d) f32
    pooled = jnp.sum(y, axis=2)
    yimg = jnp.take_along_axis(y, inv[None, :, :, None], axis=2)
    y01 = yimg[:, :2].reshape(B, 2, H, W, d)
    y23 = yimg[:, 2:].reshape(B, 2, H, W, d).transpose(0, 1, 3, 2, 4)
    return y01, y23, pooled


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _nss_vjp(x, x_proj_w, dt_w, A, D, delta_bias,
             scan_len, shift, serving, vert_p, chunk, interpret):
    return _forward(x, x_proj_w, dt_w, A, D, delta_bias,
                    scan_len, shift, serving, vert_p, chunk, interpret)


def _nss_fwd(x, x_proj_w, dt_w, A, D, delta_bias,
             scan_len, shift, serving, vert_p, chunk, interpret):
    out = _forward(x, x_proj_w, dt_w, A, D, delta_bias,
                   scan_len, shift, serving, vert_p, chunk, interpret)
    return out, (x, x_proj_w, dt_w, A, D, delta_bias)


def _nss_bwd(scan_len, shift, serving, vert_p, chunk, interpret, res, g):
    x, wxp, wdt, A, D, bias = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, scan_len=scan_len, shift=shift),
        x, wxp, wdt, A, D, bias,
    )
    g = jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), g)
    return vjp(g)


_nss_vjp.defvjp(_nss_fwd, _nss_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("scan_len", "shift", "serving", "vert_p", "chunk",
                     "interpret"),
)
def nss_scan_fused(
    x: jnp.ndarray,  # (B, H, W, D) post-dwconv activations, image layout
    x_proj_w: jnp.ndarray,  # (K=4, R + 2N, D)
    dt_w: jnp.ndarray,  # (K, D, R)
    A: jnp.ndarray,  # (K, D, N) (already -exp(A_log))
    D: jnp.ndarray,  # (K, D)
    delta_bias: jnp.ndarray,  # (K, D)
    scan_len: int = 4,
    shift: bool = False,  # odd MaIR blocks use the shifted NSS variant
    serving: bool = False,  # bf16 projections + bf16 y/input IO
    vert_p: int = 16,
    chunk: int = 512,
    interpret: bool = False,
):
    """Returns (y01, y23, pooled):
      y01 (B, 2, H, W, D) — directions 0/1 scan outputs in image layout;
      y23 (B, 2, W, H, D) — directions 2/3, in *transposed* image layout
        (y23[b, k, w, h] is the output for pixel (h, w));
      pooled (B, 4, D) f32 — per-direction channel sums over all pixels
        (the ShuffleAttn gate's global average x L).
    """
    if scan_len % 2 != 0:
        raise ValueError(f"scan_len must be even; got {scan_len}")
    if x.shape[1] % scan_len or x.shape[2] % scan_len:
        raise ValueError(
            f"H and W must be multiples of scan_len (directions 2/3 stripe "
            f"the transposed image); got {x.shape}"
        )
    if vert_p <= 0 or (vert_p & (vert_p - 1)) != 0:
        raise ValueError(f"vert_p must be a power of two; got {vert_p}")
    if chunk <= 0 or chunk % 8:
        raise ValueError(f"chunk must be a positive multiple of 8; got {chunk}")
    return _nss_vjp(x, x_proj_w, dt_w, A, D, delta_bias,
                    scan_len, shift, serving, vert_p, chunk, interpret)
