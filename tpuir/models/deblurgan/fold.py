"""Phase-domain folding of the FPN tail's nearest-upsample ×2 + 3×3 conv.

The DeblurGANv2 generators end with ``upsample_nearest(s, 2)`` followed by
a 3×3 zero-padded conv to 3 channels, then ``clip(tanh(f) + x, -1, 1)``
(reference: /root/reference/src/deblurganv2/models/fpn_mobilenet.py:144-147,
fpn_inception.py:165-169). On TPU the upsampled (N, 2H, 2W, C) tensor is an
HBM round trip ~4× the conv input, and the C_out=3 conv output occupies a
128-lane tile at 3/128 fill — measured at ~14 ms of the 58 ms
FPN-MobileNet@2048 forward (benchmarks/micro_mobilenet.py).

Because nearest-×2 duplicates pixels, the composite is EXACTLY a stride-1
conv in the low-resolution domain producing the four output phases
(di, dj) ∈ {0,1}²:

    y[2i+di, 2j+dj] = Σ_{u,v} k[u,v] · up[2i+di+u-1, 2j+dj+v-1]
                    = Σ_{a,b}  e_di[a] ⊗ e_dj[b] · low[i+a, j+b]

with per-phase effective taps (center-anchored, a ∈ {-1,0,1})

    e_0 = [k0, k1+k2, 0]        e_1 = [0, k0+k1, k2]

and zero padding 1 in the low domain reproducing the high-domain zero
padding exactly (up[-1] = 0 ↔ low[-1] = 0).  The skip/tanh/clip epilogue
then runs on the (N, H, W, 4·C_out) phase layout — 12 lanes instead of two
materialized 3-lane 4MPix tensors — with a single depth-to-space at the
end.  The fold is mathematically exact up to the k1+k2 pre-summation
(≤1 ulp reassociation).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def fold_up2_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Fold a (3, 3, Cin, Cout) kernel over a nearest-×2 upsample.

    Returns a (3, 3, Cin, 4·Cout) kernel whose output channels are the four
    phases in (di, dj)-major, channel-minor order — the order
    :func:`depth_to_space2` and :func:`space_to_depth2` use.
    """
    if k.shape[:2] != (3, 3):
        raise ValueError(f"fold_up2_kernel expects a 3x3 kernel, got {k.shape}")
    z = jnp.zeros_like(k[0])  # (3, Cin, Cout)

    def fold_rows(kk, d):  # fold axis 0 for row phase d
        if d == 0:
            return jnp.stack([kk[0], kk[1] + kk[2], jnp.zeros_like(kk[0])])
        return jnp.stack([jnp.zeros_like(kk[0]), kk[0] + kk[1], kk[2]])

    def fold_cols(kk, d):  # fold axis 1 for column phase d
        if d == 0:
            return jnp.stack([kk[:, 0], kk[:, 1] + kk[:, 2], z], axis=1)
        return jnp.stack([jnp.zeros_like(kk[:, 0]), kk[:, 0] + kk[:, 1], kk[:, 2]], axis=1)

    phases = [fold_cols(fold_rows(k, di), dj) for di in (0, 1) for dj in (0, 1)]
    return jnp.concatenate(phases, axis=-1)


def fold_s2_entry_kernel(k: jnp.ndarray, padding: str = "same") -> jnp.ndarray:
    """Fold a (3, 3, Cin, Cout) stride-2 conv kernel for phase-layout input.

    A full-resolution 3x3 stride-2 conv consuming a (N, H/2, W/2, 4*Cin)
    space-to-depth2 input is EXACTLY a stride-1 (2, 2) conv on the phase
    grid: full row 2i+u-1 is phase (u+1)%2 of block i + (u-1)//2, so the
    taps regroup as

      padding='same'  (zero pad 1; MobileNetV2 features_0):
          block a=0 (i-1): u=0 -> phase 1        | pad left/top 1
          block a=1 (i):   u=1 -> phase 0, u=2 -> phase 1
      padding='valid' (Inception conv2d_1a, out = H/2 - 1):
          block a=0 (i):   u=0 -> phase 0, u=1 -> phase 1
          block a=1 (i+1): u=2 -> phase 0       | no pad

    Returns a (2, 2, 4*Cin, Cout) kernel for phase-major (di, dj, c)
    channel order (the space_to_depth2 order). Use with
    ``padding=((1, 0), (1, 0))`` for 'same' and ``padding='VALID'`` for
    'valid'.
    """
    if k.shape[:2] != (3, 3):
        raise ValueError(f"fold_s2_entry_kernel expects 3x3, got {k.shape}")
    cin, cout = k.shape[2], k.shape[3]
    if padding == "same":
        tap = {0: (0, 1), 1: (1, 0), 2: (1, 1)}  # u -> (block a, phase)
    elif padding == "valid":
        tap = {0: (0, 0), 1: (0, 1), 2: (1, 0)}
    else:
        raise ValueError(padding)
    pk = jnp.zeros((2, 2, 4 * cin, cout), k.dtype)
    for u in range(3):
        au, pu = tap[u]
        for v in range(3):
            av, pv = tap[v]
            ch = (pu * 2 + pv) * cin
            pk = pk.at[au, av, ch : ch + cin, :].set(k[u, v])
    return pk


def depth_to_space2(y: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, H, W, 4c) phase layout → (N, 2H, 2W, c); phases (di, dj)-major."""
    n, h, w, c4 = y.shape
    assert c4 == 4 * c, (y.shape, c)
    y = y.reshape(n, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(N, 2H, 2W, c) → (N, H, W, 4c) phase layout; inverse of depth_to_space2."""
    n, h2, w2, c = x.shape
    assert h2 % 2 == 0 and w2 % 2 == 0, x.shape
    x = x.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 // 2, w2 // 2, 4 * c)


def folded_tail(smoothed: jnp.ndarray, skip: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray, phase_skip: bool = False,
                phase_out: bool = False) -> jnp.ndarray:
    """Phase-domain ``clip(tanh(conv3x3(up2(smoothed))) + skip, -1, 1)``.

    ``smoothed`` is (N, H, W, Cin); ``skip`` is the full-resolution
    (N, 2H, 2W, Cout) input image, or — with ``phase_skip`` — its
    (N, H, W, 4*Cout) space-to-depth2 form (the engine's phase-IO mode,
    where the device never touches a lane-starved Cout-channel
    full-resolution tensor). With ``phase_out`` the result stays in phase
    layout for the host-side depth-to-space.
    """
    cout = kernel.shape[-1]
    w4 = fold_up2_kernel(kernel)
    y4 = lax.conv_general_dilated(
        smoothed, w4.astype(smoothed.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x4 = skip if phase_skip else space_to_depth2(skip)
    out4 = jnp.clip(
        jnp.tanh(y4 + jnp.tile(bias, 4).astype(y4.dtype)) + x4, -1.0, 1.0
    )
    if phase_out:
        return out4
    return depth_to_space2(out4, cout)


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/f, W/f, f*f*C), phase order (di, dj, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // f, w // f, f * f * c)


def depth_to_space(y: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, f, f, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, f * h, f * w, c)


def derive_packed_kernel(lin_fn, cin: int, support: int, blocks: int = None):
    """Numerically extract the conv kernel equivalent to a linear map.

    ``lin_fn`` maps a phase-packed (1, S, S, cin) block grid to a
    phase-packed (1, S', S', cout) block grid and must be LINEAR and
    block-translation-invariant with receptive field <= ``support``
    blocks (odd, zero 'same' padding). Probing with unit impulses at the
    center block gives the exact (support, support, cin, cout) HWIO
    kernel — no hand index derivation, so re-folded paths are correct by
    construction for ANY packing (used by the phase-packed DeblurGANv2
    serving convs; cost: cin tiny probe forwards at trace time, folded
    into the jit constant).
    """
    s = blocks or (support + 4)
    mid = s // 2
    probes = jnp.zeros((cin, s, s, cin), jnp.float32)
    probes = probes.at[jnp.arange(cin), mid, mid, jnp.arange(cin)].set(1.0)
    import jax

    resp = jax.vmap(lambda p: lin_fn(p[None])[0])(probes)  # (cin, S, S, cout)
    assert resp.shape[1] == s and resp.shape[2] == s, (
        "derive_packed_kernel needs a same-size block map", resp.shape, s)
    r = support // 2
    # y[p] = sum_u k[u] x[p+u-r]  =>  k[u] = resp[mid + r - u]
    win = resp[:, mid - r : mid + r + 1, mid - r : mid + r + 1, :]
    return win[:, ::-1, ::-1, :].transpose(1, 2, 0, 3)


def packed_pw_kernel(k: jnp.ndarray, phases: int = 4) -> jnp.ndarray:
    """(1, 1, Cin, Cout) -> block-diagonal (1, 1, P*Cin, P*Cout).

    A 1x1 conv commutes with space_to_depth: each phase's channels map
    independently by the same matrix. Exact; the off-diagonal zeros cost
    MXU flops it has to spare (measured 2.4x faster than the
    lane-starved direct op at the f1/f2 shapes, explore_packed_conv.py).
    """
    cin, cout = k.shape[2], k.shape[3]
    kp = jnp.zeros((1, 1, phases * cin, phases * cout), k.dtype)
    for p in range(phases):
        kp = kp.at[0, 0, p * cin:(p + 1) * cin, p * cout:(p + 1) * cout].set(
            k[0, 0])
    return kp


def derive_packed_kernel_strided(lin_fn, cin: int, support: int, stride: int,
                                 blocks: int = None):
    """Strided generalization of :func:`derive_packed_kernel`.

    ``lin_fn`` maps a (1, S, S, cin) block grid to (1, S/stride, S/stride,
    cout) with ``y[i] = sum_u k[u] x[stride*i + u - support//2]`` (the
    alignment of a SAME-padded logical stride conv under uniform folding).
    Probes ``stride`` adjacent impulse columns to cover every tap parity.
    Use with ``lax.conv_general_dilated(..., (stride, stride),
    ((support//2,)*2,)*2)``.
    """
    import jax

    s = blocks or (2 * support + 8)
    s -= s % stride
    mid = (s // 2) - ((s // 2) % stride)
    pad = support // 2
    kern = None
    for dr in range(stride):
        for dc in range(stride):
            mr, mc = mid + dr, mid + dc
            probes = jnp.zeros((cin, s, s, cin), jnp.float32)
            probes = probes.at[jnp.arange(cin), mr, mc, jnp.arange(cin)].set(1.0)
            resp = jax.vmap(lambda p: lin_fn(p[None])[0])(probes)
            if kern is None:
                kern = jnp.zeros((support, support, cin, resp.shape[-1]),
                                 jnp.float32)
            for i in range(resp.shape[1]):
                u = mr + pad - stride * i
                if not 0 <= u < support:
                    continue
                for j in range(resp.shape[2]):
                    v = mc + pad - stride * j
                    if 0 <= v < support:
                        kern = kern.at[u, v].set(resp[:, i, j, :])
    return kern


class FinalTail(nn.Module):
    """``clip(tanh(conv3x3(up2(s))) + x, -1, 1)`` with an optional exact fold.

    Instantiated with ``name="final"`` so its ``kernel``/``bias`` params are
    pytree-identical to the ``nn.Conv(name="final")`` the unfolded models
    declared — converted checkpoints load into either path unchanged.

    With ``fold=True`` the phase-domain fold requires ``skip`` to be exactly
    2x ``smoothed`` in H and W (the generators guarantee this for even input
    sizes; the engine's pad-to-32 makes production inputs always even). For
    odd input sizes the upsample path is dim-wise ambiguous, so the module
    silently falls back to the unfolded (still exact) tail; a skip that is
    even but NOT 2x smoothed indicates a wiring bug and raises.
    """

    out: int
    fold: bool = False
    # phase_io: ``smoothed`` arrives pack2 (N, S, S, 4*cin), ``skip`` is
    # the pack4 input image (N, S, S, 16*out), and the result stays pack4
    # — the up2+conv composite becomes one MXU-shaped (3,3,4cin,16out)
    # conv (measured 12.3 -> 1.2 ms @2048, benchmarks/explore_packed_conv.py)
    phase_io: bool = False

    @nn.compact
    def __call__(self, smoothed: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        cin = smoothed.shape[-1] // (4 if self.phase_io else 1)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.out)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out,))
        if self.phase_io:
            if skip.shape[1:3] != smoothed.shape[1:3]:
                raise ValueError(
                    f"FinalTail(phase_io): pack4 skip {skip.shape} must match "
                    f"pack2 smoothed {smoothed.shape} spatially")

            def tail_map(sp):
                s = depth_to_space(sp, 2, cin)
                up = jnp.repeat(jnp.repeat(s, 2, axis=1), 2, axis=2)
                y = lax.conv_general_dilated(
                    up, kernel, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return space_to_depth(y, 4)

            pk = derive_packed_kernel(tail_map, 4 * cin, 3)
            y16 = lax.conv_general_dilated(
                smoothed, pk.astype(smoothed.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            b16 = jnp.tile(bias, 16).astype(y16.dtype)
            return jnp.clip(jnp.tanh(y16 + b16) + skip, -1.0, 1.0)
        if self.fold and skip.shape[1] % 2 == 0 and skip.shape[2] % 2 == 0:
            if (skip.shape[1] != 2 * smoothed.shape[1]
                    or skip.shape[2] != 2 * smoothed.shape[2]):
                raise ValueError(
                    f"FinalTail(fold=True): skip {skip.shape} is not exactly "
                    f"2x smoothed {smoothed.shape}")
            return folded_tail(smoothed, skip, kernel, bias)
        up = jnp.repeat(jnp.repeat(smoothed, 2, axis=1), 2, axis=2)
        f = lax.conv_general_dilated(
            up, kernel.astype(up.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(up.dtype)
        return jnp.clip(jnp.tanh(f) + skip, -1.0, 1.0)
