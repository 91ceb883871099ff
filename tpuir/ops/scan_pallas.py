"""Pallas selective-scan kernel (Mamba S6) for TPU.

The XLA blocked associative scan (tpuir/ops/selective_scan.py) materializes
every scan level through HBM; on v5e that makes MaIR's 36x4 scans dominate
the forward (~0.5 s at 128^2). These kernels keep each L-chunk's whole
scan resident in VMEM and fuse the discretization (softplus, exp, dt*B*u)
and the output contraction (y = C.h + D.u), so HBM sees each operand
exactly once. Two in-VMEM scan schedules exist: a radix-4 Blelloch over
(a, b) pairs ('pairs') and the default two-level vertical scan ('vert',
see _make_fused_kernel_vert) — the kernel is VPU-op-count-bound, and the
vertical schedule needs fewer ops and no interleave relayouts.

Grid: (B*K, D_tiles, L_chunks) with the chunk axis innermost; a (N, Dt)
scratch carries the hidden state across chunks. Channel tiles put D on the
128-lane axis — (chunk, N, Dt) blocks. All math float32 (the CUDA kernel's
precision). The wrapper pads D and L; padded rows sit after the real
sequence so their garbage never flows backward, and padded channels have
A=0, u=0 => y=0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blelloch(a, b, n: int, d_tile: int):
    """In-VMEM work-efficient inclusive scan of the affine recurrence
    h_i = a_i h_{i-1} + b_i over the leading axis, radix 4 (a radix-2 level
    mops up when the length is 2 mod 4). Returns (A, B) where A = prefix
    products and B = prefix solutions with h0 = 0.

    Radix 4 halves the number of interleave levels versus radix 2 — fewer
    level passes and relayouts on the scan's hot path (the vertical
    schedule in _make_fused_kernel_vert goes further and needs none).
    """
    levels = []
    ca, cb = a, b
    while ca.shape[0] > 1:  # upsweep
        if ca.shape[0] % 4 == 0:
            m = ca.shape[0] // 4
            pa = ca.reshape(m, 4, n, d_tile)
            pb = cb.reshape(m, 4, n, d_tile)
            g0a, g1a, g2a, g3a = pa[:, 0], pa[:, 1], pa[:, 2], pa[:, 3]
            g0b, g1b, g2b, g3b = pb[:, 0], pb[:, 1], pb[:, 2], pb[:, 3]
            c1a = g1a * g0a
            c1b = g1a * g0b + g1b
            c2a = g2a * c1a
            c2b = g2a * c1b + g2b
            levels.append((g0a, g0b, c1a, c1b, c2a, c2b))
            ca = g3a * c2a
            cb = g3a * c2b + g3b
        else:
            m = ca.shape[0] // 2
            pa = ca.reshape(m, 2, n, d_tile)
            pb = cb.reshape(m, 2, n, d_tile)
            la, ra = pa[:, 0], pa[:, 1]
            lb, rb = pb[:, 0], pb[:, 1]
            levels.append((la, lb))
            ca = ra * la
            cb = ra * lb + rb
    ea = jnp.ones((1, n, d_tile), a.dtype)  # exclusive prefixes
    eb = jnp.zeros((1, n, d_tile), a.dtype)
    for lv in reversed(levels):  # downsweep
        m = ea.shape[0]
        if len(lv) == 6:
            g0a, g0b, c1a, c1b, c2a, c2b = lv
            e1a, e1b = g0a * ea, g0a * eb + g0b
            e2a, e2b = c1a * ea, c1a * eb + c1b
            e3a, e3b = c2a * ea, c2a * eb + c2b
            ea = jnp.stack([ea, e1a, e2a, e3a], axis=1).reshape(
                4 * m, n, d_tile
            )
            eb = jnp.stack([eb, e1b, e2b, e3b], axis=1).reshape(
                4 * m, n, d_tile
            )
        else:
            la, lb = lv
            era, erb = la * ea, la * eb + lb
            ea = jnp.stack([ea, era], axis=1).reshape(2 * m, n, d_tile)
            eb = jnp.stack([eb, erb], axis=1).reshape(2 * m, n, d_tile)
    return a * ea, a * eb + b  # inclusive = element o exclusive-prefix


def _make_kernel(chunk: int, n: int, d_tile: int):
    def kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, bias_ref, y_ref,
               h_carry):
        lc = pl.program_id(2)

        @pl.when(lc == 0)
        def _reset():
            h_carry[:] = jnp.zeros_like(h_carry)

        u = u_ref[0].astype(jnp.float32)  # (chunk, Dt)
        dt = jax.nn.softplus(dt_ref[0].astype(jnp.float32) + bias_ref[0, 0])
        a = jnp.exp(dt[:, None, :] * A_ref[0])  # (chunk, N, Dt)
        b = B_ref[0][:, :, None] * (dt * u)[:, None, :]

        a, b = _blelloch(a, b, n, d_tile)

        h_all = a * h_carry[:][None] + b  # (chunk, N, Dt)
        y = jnp.sum(h_all * C_ref[0][:, :, None], axis=1)  # (chunk, Dt)
        y = y + D_ref[0, 0] * u
        y_ref[0] = y
        h_carry[:] = h_all[chunk - 1]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("delta_softplus", "chunk", "d_tile", "interpret")
)
def selective_scan_pallas(
    u: jnp.ndarray,  # (B, K, L, D)
    delta: jnp.ndarray,  # (B, K, L, D)
    A: jnp.ndarray,  # (K, D, N) (already -exp(A_log))
    Bmat: jnp.ndarray,  # (B, K, L, N)
    Cmat: jnp.ndarray,  # (B, K, L, N)
    D: jnp.ndarray | None = None,  # (K, D)
    delta_bias: jnp.ndarray | None = None,  # (K, D)
    delta_softplus: bool = True,
    chunk: int = 512,
    d_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    assert delta_softplus, "kernel fuses softplus; raw-delta mode unused"
    if chunk <= 0 or (chunk & (chunk - 1)) != 0:
        raise ValueError(
            f"chunk must be a power of two (Blelloch pairing halves the "
            f"level each step); got {chunk}"
        )
    b, k, L, d = u.shape
    n = A.shape[-1]
    dp = (-d) % d_tile
    lp = (-L) % chunk
    Dp, Lp = d + dp, L + lp

    pad_ld = ((0, 0), (0, 0), (0, lp), (0, dp))
    pad_ln = ((0, 0), (0, 0), (0, lp), (0, 0))
    u_p = jnp.pad(u.astype(jnp.float32), pad_ld).reshape(b * k, Lp, Dp)
    dt_p = jnp.pad(delta.astype(jnp.float32), pad_ld).reshape(b * k, Lp, Dp)
    B_p = jnp.pad(Bmat.astype(jnp.float32), pad_ln).reshape(b * k, Lp, n)
    C_p = jnp.pad(Cmat.astype(jnp.float32), pad_ln).reshape(b * k, Lp, n)
    # (K, N, Dp) so kernel blocks put D on lanes
    A_p = jnp.pad(A.astype(jnp.float32), ((0, 0), (0, dp), (0, 0))).transpose(0, 2, 1)
    D_p = (
        jnp.pad(D.astype(jnp.float32), ((0, 0), (0, dp)))
        if D is not None
        else jnp.zeros((k, Dp), jnp.float32)
    )
    bias_p = (
        jnp.pad(delta_bias.astype(jnp.float32), ((0, 0), (0, dp)))
        if delta_bias is not None
        else jnp.zeros((k, Dp), jnp.float32)
    )

    n_dt = Dp // d_tile
    n_lc = Lp // chunk
    grid = (b * k, n_dt, n_lc)
    # (k*n_dt, 1, d_tile): keeps the last-two block dims tile-aligned
    D_p = D_p.reshape(k * n_dt, 1, d_tile)
    bias_p = bias_p.reshape(k * n_dt, 1, d_tile)

    y = pl.pallas_call(
        _make_kernel(chunk, n, d_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d_tile), lambda bk, dt_, lc: (bk, lc, dt_)),
            pl.BlockSpec((1, chunk, d_tile), lambda bk, dt_, lc: (bk, lc, dt_)),
            pl.BlockSpec((1, n, d_tile), lambda bk, dt_, lc: (bk % k, 0, dt_)),
            pl.BlockSpec((1, chunk, n), lambda bk, dt_, lc: (bk, lc, 0)),
            pl.BlockSpec((1, chunk, n), lambda bk, dt_, lc: (bk, lc, 0)),
            pl.BlockSpec(
                (1, 1, d_tile), lambda bk, dt_, lc: ((bk % k) * n_dt + dt_, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, d_tile), lambda bk, dt_, lc: ((bk % k) * n_dt + dt_, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, d_tile), lambda bk, dt_, lc: (bk, lc, dt_)
        ),
        out_shape=jax.ShapeDtypeStruct((b * k, Lp, Dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, d_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u_p, dt_p, A_p, B_p, C_p, D_p, bias_p)
    return y.reshape(b, k, Lp, Dp)[:, :, :L, :d]


# ---------------------------------------------------------------------------
# Fully-fused variant: the x_proj / dt_proj projections move inside the
# kernel, so HBM sees only xs (read) and y (write). Requires the whole
# channel dim in one lane tile (true for every released MaIR config).
# ---------------------------------------------------------------------------


def _make_fused_kernel(chunk: int, n: int, r: int, d_tile: int,
                       serving: bool):
    if serving:
        # serving mode: single-pass bf16 MXU projections (f32 accumulate)
        mm = dict(preferred_element_type=jnp.float32)

        def _proj(x, w, dims):
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (dims, ((), ())), **mm,
            )
    else:

        def _proj(x, w, dims):
            return jax.lax.dot_general(
                x, w, (dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    # serving also stores the scan's (a, b) level arrays in bf16; measured
    # roughly neutral on v5e (the kernel is op-bound, not byte-bound) but
    # kept for parity with the historical serving numbers. The exponential
    # forgetting of the recurrence keeps the compounded rounding small
    # (quantified by scripts/validate_serving.py).
    level_dtype = jnp.bfloat16 if serving else jnp.float32

    def kernel(xs_ref, wxp_ref, wdt_ref, A_ref, D_ref, bias_ref, y_ref,
               h_carry):
        lc = pl.program_id(1)

        @pl.when(lc == 0)
        def _reset():
            h_carry[:] = jnp.zeros_like(h_carry)

        xs = xs_ref[0].astype(jnp.float32)  # (chunk, Dp)
        xdbl = _proj(xs, wxp_ref[0], ((1,), (1,)))  # (chunk, R + 2N)
        dt_raw = _proj(xdbl[:, :r], wdt_ref[0], ((1,), (1,)))  # (chunk, Dp)
        Bc = xdbl[:, r : r + n]  # (chunk, N)
        Cc = xdbl[:, r + n : r + 2 * n]
        dt = jax.nn.softplus(dt_raw + bias_ref[0])
        a = jnp.exp(dt[:, None, :] * A_ref[0])  # (chunk, N, Dp)
        b = Bc[:, :, None] * (dt * xs)[:, None, :]

        a, b = _blelloch(
            a.astype(level_dtype), b.astype(level_dtype), n, d_tile
        )
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)

        h_all = a * h_carry[:][None] + b
        y = jnp.sum(h_all * Cc[:, :, None], axis=1)
        y_ref[0] = y + D_ref[0] * xs
        h_carry[:] = h_all[chunk - 1]

    return kernel


def _make_fused_kernel_vert(chunk: int, n: int, r: int, d_tile: int,
                            serving: bool, P: int = 16):
    """Fused-projection kernel with a 'vertical' two-level scan.

    The chunk is viewed as (S, P): S contiguous subchunks of P tokens.
    Level 1 runs the recurrence sequentially over the P in-subchunk
    positions, vectorized across all S subchunks (each step is elementwise
    on an (S, N, D) slab — no Blelloch interleave relayouts). Level 2
    chains the S subchunk carries sequentially on (N, D) tiles, and a
    final elementwise pass combines. ~6 passes over the (L, N, D) working
    set versus ~12+ for the pairwise Blelloch, at the same exp count.
    """
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

    S_ = chunk // P

    def kernel(xs_ref, wxp_ref, wdt_ref, A_ref, D_ref, bias_ref, y_ref,
               h_carry, HA, HB):
        lc = pl.program_id(1)

        @pl.when(lc == 0)
        def _reset():
            h_carry[:] = jnp.zeros_like(h_carry)

        xs = xs_ref[0].astype(jnp.float32)  # (chunk, Dp)
        xdbl = _proj(xs, wxp_ref[0], ((1,), (1,)))  # (chunk, R + 2N)
        dt_raw = _proj(xdbl[:, :r], wdt_ref[0], ((1,), (1,)))  # (chunk, Dp)
        Bc = xdbl[:, r : r + n]  # (chunk, N)
        Cc = xdbl[:, r + n : r + 2 * n]
        dt = jax.nn.softplus(dt_raw + bias_ref[0])
        A = A_ref[0]  # (N, Dp)

        dt4 = dt.reshape(S_, P, d_tile)
        du4 = (dt * xs).reshape(S_, P, d_tile)
        B4 = Bc.reshape(S_, P, n)
        hA = hB = None
        for p in range(P):  # level 1: sequential over positions
            av = jnp.exp(dt4[:, p][:, None, :] * A[None])  # (S, N, Dp)
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
        for s in range(S_):
            ces.append(c)
            c = HA[s, P - 1] * c + HB[s, P - 1]
        h_carry[:] = c
        CE = jnp.stack(ces, axis=0)  # (S, N, Dp)

        h_all = HA[:] * CE[:, None] + HB[:]  # (S, P, N, Dp)
        y = jnp.sum(h_all * Cc.reshape(S_, P, n)[..., None], axis=2)
        y_ref[0] = y.reshape(chunk, d_tile) + D_ref[0] * xs

    return kernel


def _fused_forward(xs, x_proj_w, dt_w, A, D, delta_bias,
                   chunk, serving, algo, vert_p, interpret):
    b, k, L, d = xs.shape
    r_plus_2n = x_proj_w.shape[1]
    n = A.shape[-1]
    r = r_plus_2n - 2 * n
    dp = (-d) % 128
    lp = (-L) % chunk
    Dp, Lp = d + dp, L + lp

    # keep the caller's dtype through HBM (bf16 xs halves the kernel's read
    # traffic in serving mode); the kernel casts to float32 on load
    xs_p = jnp.pad(xs, ((0, 0), (0, 0), (0, lp), (0, dp))).reshape(b * k, Lp, Dp)
    wxp = jnp.pad(x_proj_w.astype(jnp.float32), ((0, 0), (0, 0), (0, dp)))
    wdt = jnp.pad(dt_w.astype(jnp.float32), ((0, 0), (0, dp), (0, 0)))
    A_p = jnp.pad(A.astype(jnp.float32), ((0, 0), (0, dp), (0, 0))).transpose(0, 2, 1)
    D_p = jnp.pad(D.astype(jnp.float32), ((0, 0), (0, dp)))[:, None, :]
    bias_p = jnp.pad(delta_bias.astype(jnp.float32), ((0, 0), (0, dp)))[:, None, :]

    if algo == "vert":
        if vert_p <= 0 or (vert_p & (vert_p - 1)) != 0:
            raise ValueError(f"vert_p must be a power of two; got {vert_p}")
        P = vert_p if chunk % vert_p == 0 else chunk  # chunk < P: one subchunk
        make = lambda *a: _make_fused_kernel_vert(*a, P=P)
        extra_scratch = [
            pltpu.VMEM((chunk // P, P, n, Dp), jnp.float32),
            pltpu.VMEM((chunk // P, P, n, Dp), jnp.float32),
        ]
    elif algo == "pairs":
        make = _make_fused_kernel
        extra_scratch = []
    else:
        raise ValueError(f"algo must be 'vert' or 'pairs'; got {algo!r}")
    y = pl.pallas_call(
        make(chunk, n, r, Dp, serving),
        grid=(b * k, Lp // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, Dp), lambda bk, lc: (bk, lc, 0)),
            pl.BlockSpec((1, r_plus_2n, Dp), lambda bk, lc: (bk % k, 0, 0)),
            pl.BlockSpec((1, Dp, r), lambda bk, lc: (bk % k, 0, 0)),
            pl.BlockSpec((1, n, Dp), lambda bk, lc: (bk % k, 0, 0)),
            pl.BlockSpec((1, 1, Dp), lambda bk, lc: (bk % k, 0, 0)),
            pl.BlockSpec((1, 1, Dp), lambda bk, lc: (bk % k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, Dp), lambda bk, lc: (bk, lc, 0)),
        out_shape=jax.ShapeDtypeStruct((b * k, Lp, Dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, Dp), jnp.float32)] + extra_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs_p, wxp, wdt, A_p, D_p, bias_p)
    return y.reshape(b, k, Lp, Dp)[:, :, :L, :d]


# The pallas kernels have no lowering for reverse-mode autodiff, but the
# fused op == (einsum projections + selective_scan); training (jax.grad on
# TPU through SSMixer) therefore differentiates that XLA composition in
# the backward pass while the forward keeps the fused kernel.


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused_vjp(xs, x_proj_w, dt_w, A, D, delta_bias,
               chunk, serving, algo, vert_p, interpret):
    return _fused_forward(xs, x_proj_w, dt_w, A, D, delta_bias,
                          chunk, serving, algo, vert_p, interpret)


def _fused_fwd(xs, x_proj_w, dt_w, A, D, delta_bias,
               chunk, serving, algo, vert_p, interpret):
    y = _fused_forward(xs, x_proj_w, dt_w, A, D, delta_bias,
                       chunk, serving, algo, vert_p, interpret)
    return y, (xs, x_proj_w, dt_w, A, D, delta_bias)


def _reference_composition(xs, wxp, wdt, A, D, bias, chunk):
    from tpuir.ops.selective_scan import selective_scan

    n = A.shape[-1]
    r = wxp.shape[1] - 2 * n
    xs32 = xs.astype(jnp.float32)
    xdbl = jnp.einsum("bkld,kcd->bklc", xs32, wxp,
                      preferred_element_type=jnp.float32)
    dts = jnp.einsum("bklr,kdr->bkld", xdbl[..., :r], wdt,
                     preferred_element_type=jnp.float32)
    return selective_scan(
        xs32, dts, A, xdbl[..., r : r + n], xdbl[..., r + n :], D, bias,
        delta_softplus=True, chunk=chunk,
    )


def _fused_bwd(chunk, serving, algo, vert_p, interpret, res, g):
    xs, wxp, wdt, A, D, bias = res
    _, vjp = jax.vjp(
        lambda *a: _reference_composition(*a, chunk=chunk),
        xs, wxp, wdt, A, D, bias,
    )
    return vjp(g)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(
    jax.jit, static_argnames=("chunk", "serving", "algo", "vert_p", "interpret")
)
def selective_scan_fused_proj(
    xs: jnp.ndarray,  # (B, K, L, D) post-dwconv scanned sequences
    x_proj_w: jnp.ndarray,  # (K, R + 2N, D)
    dt_w: jnp.ndarray,  # (K, D, R)
    A: jnp.ndarray,  # (K, D, N) (already -exp(A_log))
    D: jnp.ndarray,  # (K, D)
    delta_bias: jnp.ndarray,  # (K, D)
    chunk: int = 256,
    serving: bool = False,  # bf16 projections + bf16 level storage
    algo: str = "vert",  # 'vert' = two-level vertical scan (sequential
    #   positions x vectorized subchunks; measured ~11% faster than
    #   'pairs', the (a,b)-pair radix-4 Blelloch, which remains selectable)
    vert_p: int = 16,  # subchunk length P of the vertical scan
    interpret: bool = False,
) -> jnp.ndarray:
    if chunk <= 0 or (chunk & (chunk - 1)) != 0:
        raise ValueError(
            f"chunk must be a power of two (Blelloch pairing halves the "
            f"level each step); got {chunk}"
        )
    return _fused_vjp(xs, x_proj_w, dt_w, A, D, delta_bias,
                      chunk, serving, algo, vert_p, interpret)
