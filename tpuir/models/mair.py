"""MaIR: Mamba-based image restoration (flat SwinIR-style variant).

TPU-native re-design of the reference architecture
(/root/reference/src/mair/basicsr/archs/mair_arch.py). The sequential
``mamba_ssm`` CUDA selective scan becomes a blocked associative scan
(tpuir/ops/selective_scan.py); the NSS scan permutations are precomputed
NumPy index arrays captured as jit constants per static (H, W) — the
equivalent of the reference's ``dynamic_ids=False`` caching
(mair_arch.py:661-698).

Simplifications that are *math-preserving* (verified in tests):
  * The ShuffleAttn gate (mair_arch.py:25-66) physically channel-shuffles,
    1x1-group-convs the global average, and shuffles back. Because the gate
    is a per-(direction, channel) scalar and the spatial mean is
    permutation-invariant, we compute it directly from the scanned
    sequences with one (D,4,4) einsum — no shuffles, no inverse gather
    before gating.
  * Token (B, L, C) <-> image (B, H, W, C) moves are pure reshapes in NHWC,
    so PatchEmbed/PatchUnEmbed disappear; only their LayerNorm survives.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpuir.ops.scan_ids import mair_scan_ids
from tpuir.ops.selective_scan import selective_scan


class TorchLayerNorm(nn.Module):
    """LayerNorm over the last axis with torch parameter naming/semantics.

    ``_params`` is the (sole) compact method so fused kernels can pull the
    raw (weight, bias) arrays without applying the layer; ``__call__``
    routes through it."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def _params(self):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return weight, bias

    def __call__(self, x):
        weight, bias = self._params()
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.eps) * weight + bias
        return y.astype(x.dtype)


class DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree (kernel[, bias]) for paths
    that consume the raw arrays in a fused kernel instead of applying the
    layer (init distribution and converter naming stay identical)."""

    in_dim: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.in_dim, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return k, b


class ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree for a depthwise conv."""

    kh: int
    kw: int
    in_per_group: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.kh, self.kw, self.in_per_group, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


def scan_ids_for(h: int, w: int, scan_len: int):
    """(scan, inverse) and shifted (scan, inverse) id constants for (h, w)."""
    s0, i0 = mair_scan_ids(h, w, scan_len, 0)
    s1, i1 = mair_scan_ids(h, w, scan_len, scan_len // 2)
    return (
        (jnp.asarray(s0), jnp.asarray(i0)),
        (jnp.asarray(s1), jnp.asarray(i1)),
    )


class SSMixer(nn.Module):
    """VMM / LoSh2D: 4-direction NSS selective-scan mixer with shuffle gate.

    Mirrors /root/reference/src/mair/basicsr/archs/mair_arch.py:111-297 and
    the identical LoSh2D (mairunet_arch.py:90-282).
    """

    d_model: int
    d_state: int = 16
    expand: float = 2.0
    scan_chunk: int = 256  # XLA-fallback scan chunk, honored exactly on the
    # XLA path. The fused-projection Pallas kernel needs >=256 positions per
    # grid step to keep its in-VMEM projections MXU-shaped, so values below
    # 256 are clamped there (measured flat 256..1024, docs/STATUS.md).
    scan_len: int = 4
    scan_io_dtype: str = "float32"  # bf16 halves gather/scan HBM traffic
    # in serving mode; the scan math itself stays float32 in-kernel

    @nn.compact
    def __call__(self, x, ids, shift: bool = False):
        B, H, W, _ = x.shape
        d_inner = int(self.expand * self.d_model)
        R = math.ceil(self.d_model / 16)
        N = self.d_state
        K = 4
        L = H * W
        scan_ids, inv_ids = ids
        io_dtype = jnp.dtype(self.scan_io_dtype)

        import os as _os

        # Ablation surgery ('nogather'/'noscan') exists only for the
        # benchmarks/explore_* cost decompositions; outputs are WRONG when
        # active, so it refuses to run without the explicit benchmark opt-in.
        _surgery = _os.environ.get("TPUIR_MAIR_SURGERY", "")
        if _surgery:
            if _os.environ.get("TPUIR_ALLOW_SURGERY") != "1":
                raise RuntimeError(
                    "TPUIR_MAIR_SURGERY is set but TPUIR_ALLOW_SURGERY=1 is "
                    "not: the surgery modes skip the NSS gather or the scan "
                    "and produce wrong restorations. Unset it, or set "
                    "TPUIR_ALLOW_SURGERY=1 in benchmark ablations only."
                )
            import warnings

            warnings.warn(
                f"MaIR ablation surgery {_surgery!r} active — model outputs "
                "are intentionally WRONG (benchmark decomposition mode)",
                stacklevel=2,
            )

        x_proj_w = self.param(
            "x_proj_weight", nn.initializers.normal(0.02), (K, R + 2 * N, d_inner)
        )
        dt_w = self.param("dt_projs_weight", nn.initializers.normal(0.02), (K, d_inner, R))
        dt_b = self.param("dt_projs_bias", nn.initializers.zeros, (K, d_inner))
        A_logs = self.param(
            "A_logs",
            lambda key, shape: jnp.tile(
                jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32))[None, None, :],
                (K, d_inner, 1),
            ),
            (K, d_inner, N),
        )
        Ds = self.param("Ds", nn.initializers.ones, (K, d_inner))
        # ShuffleAttn gate: per-(direction, channel) sigmoid of a 4x4 mix of
        # the 4 directions' global means of each channel.
        gw = self.param("gate_weight", nn.initializers.normal(0.02), (d_inner, K, K))
        gb = self.param("gate_bias", nn.initializers.zeros, (d_inner, K))

        # TPUIR_FUSED_INTERPRET=1 forces the fused branch in Pallas
        # interpret mode on CPU (test-only: exercises the branch's combine
        # logic without TPU hardware).
        _interp = _os.environ.get("TPUIR_FUSED_INTERPRET") == "1"
        # TPUIR_NSS A/B knob: 'stripe' (default) = gather-free stripe
        # kernel, 'fused' = stripe-gather nss_fused kernel, '0' = index
        # -array gather + fused-projection-scan path.
        _nss_mode = _os.environ.get("TPUIR_NSS", "stripe")
        if _nss_mode == "1":  # legacy alias from the round-3 A/B scripts
            _nss_mode = "fused"
        _pallas_ok = (
            not _surgery
            and (jax.default_backend() != "cpu" or _interp)
            and _os.environ.get("TPUIR_FUSED", "1") != "0"
            and H % self.scan_len == 0
            and W % self.scan_len == 0
        )
        stripe_ok = (
            _pallas_ok and _nss_mode == "stripe"
            and H % 2 == 0 and W % 2 == 0
        )
        fused_ok = _pallas_ok and not stripe_ok and _nss_mode != "0"
        # Fused prologue (tpuir/ops/nss_prologue.py): in_proj + dwconv +
        # SiLU + pad + transpose collapse into one Pallas pass that emits
        # the stripe kernel's operands directly (kill-switch
        # TPUIR_PROLOGUE=0). Only the stripe path consumes the
        # pre-transposed operands.
        use_prologue = stripe_ok and _os.environ.get("TPUIR_PROLOGUE", "1") != "0"
        if use_prologue:
            w_in, _ = DenseParams(
                self.d_model, d_inner * 2, use_bias=False, name="in_proj"
            )()
            conv_k, conv_b = ConvParams(3, 3, 1, d_inner, name="conv2d")()
            from tpuir.ops.nss_prologue import mixer_prologue

            xp_pre, xpT_pre, z = mixer_prologue(
                x, w_in, conv_k, conv_b, d_inner,
                serving=(io_dtype == jnp.bfloat16), interpret=_interp,
            )
        else:
            xz = nn.Dense(d_inner * 2, use_bias=False, name="in_proj")(x)
            x_, z = jnp.split(xz, 2, axis=-1)
            x_ = nn.Conv(
                d_inner, (3, 3), padding=1, feature_group_count=d_inner,
                name="conv2d",
            )(x_)
            x_ = nn.silu(x_)
        if stripe_ok:
            # Stripe-resident kernel (tpuir/ops/nss_stripe.py): the NSS
            # permutation never touches HBM — BlockSpecs walk the natural
            # -layout image in stripe order, the within-stripe involutions
            # happen on VMEM blocks, and outputs come back in final image
            # layout (half-split per direction; combine_halves fuses the
            # parity select into the gated 4-direction sum).
            from tpuir.ops.nss_stripe import combine_halves, nss_scan_stripe

            # TPUIR_RECUR_BF16=1: accuracy-gated bf16 level-1 recurrence in
            # the stripe kernel (serving mode only; validated by
            # scripts/validate_serving.py before being made a default)
            _recur_bf16 = (
                io_dtype == jnp.bfloat16
                and _os.environ.get("TPUIR_RECUR_BF16") == "1"
            )
            # TPUIR_EPILOGUE=0 kill-switch: the fused epilogue (combine +
            # out_norm + SiLU(z) gate + out_proj in one Pallas pass over
            # the keep_pad buffers, tpuir/ops/nss_epilogue.py) requires
            # the prologue's padded z.
            use_epilogue = (
                use_prologue
                and _os.environ.get("TPUIR_EPILOGUE", "1") != "0"
            )
            if use_prologue:
                from tpuir.ops.nss_stripe import nss_scan_stripe_pre

                oL01, oR01, oL23, oR23, pooled = nss_scan_stripe_pre(
                    xp_pre, xpT_pre, x_proj_w, dt_w,
                    -jnp.exp(A_logs.astype(jnp.float32)), Ds, dt_b,
                    scan_len=self.scan_len, shift=shift,
                    serving=(io_dtype == jnp.bfloat16), interpret=_interp,
                    recur_bf16=_recur_bf16, keep_pad=use_epilogue,
                )
            else:
                oL01, oR01, oL23, oR23, pooled = nss_scan_stripe(
                    x_, x_proj_w, dt_w,
                    -jnp.exp(A_logs.astype(jnp.float32)), Ds, dt_b,
                    scan_len=self.scan_len, shift=shift,
                    serving=(io_dtype == jnp.bfloat16), interpret=_interp,
                    recur_bf16=_recur_bf16,
                )
            gates = jax.nn.sigmoid(
                jnp.einsum("bid,doi->bod", pooled[..., :d_inner] / L, gw,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32) + gb.T[None]
            )  # (B, K, D)
            if use_epilogue:
                from tpuir.ops.nss_epilogue import mixer_epilogue

                ln_w, ln_b = TorchLayerNorm(d_inner, name="out_norm")._params()
                w_out, _ = DenseParams(
                    d_inner, self.d_model, use_bias=False, name="out_proj"
                )()
                out = mixer_epilogue(
                    oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out,
                    d_inner, shift=shift, scan_len=self.scan_len,
                    serving=(io_dtype == jnp.bfloat16), interpret=_interp,
                )
                return out.astype(x.dtype)
            if use_prologue:
                z = z[..., :d_inner]  # prologue pads z to the lane width
            y = combine_halves(
                oL01, oR01, oL23, oR23, gates, shift, self.scan_len
            ).reshape(B, L, d_inner)
        elif fused_ok:
            # Gather-fused Pallas kernel (tpuir/ops/nss_fused.py): stripe
            # BlockSpecs + in-VMEM involutions replace the NSS gathers, the
            # (delta, B, C) projections and the whole chunk scan run in
            # VMEM, and y comes back per-direction in image layout with the
            # gate's pooled sums as a side output — HBM never sees the
            # scanned (B, K, L, D) sequences.
            from tpuir.ops.nss_fused import nss_scan_fused

            y01, y23, pooled = nss_scan_fused(
                x_, x_proj_w, dt_w,
                -jnp.exp(A_logs.astype(jnp.float32)), Ds, dt_b,
                scan_len=self.scan_len, shift=shift,
                serving=(io_dtype == jnp.bfloat16), interpret=_interp,
            )
            # NOTE: the gate contraction must run at f32 — TPU's default
            # matmul precision is bf16 passes, and a 4e-3 relative error
            # here compounds ~3x per block through the LayerNorms (0.36
            # max-abs by block 4 on a random-weight model). The 4-direction
            # combine itself is written as elementwise multiply-adds (VPU
            # f32, fuses with the un-permute reads) rather than a K=4
            # einsum — a HIGHEST-precision dot there lowered to a slow
            # multi-pass contraction for what is really a weighted sum.
            gates = jax.nn.sigmoid(
                jnp.einsum("bid,doi->bod", pooled / L, gw,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32) + gb.T[None]
            )  # (B, K, D)
            g = gates[:, :, None, None, :]  # (B, K, 1, 1, D)
            y = (
                y01[:, 0].astype(jnp.float32) * g[:, 0]
                + y01[:, 1].astype(jnp.float32) * g[:, 1]
                + jnp.transpose(y23[:, 0], (0, 2, 1, 3)).astype(jnp.float32)
                * g[:, 2]
                + jnp.transpose(y23[:, 1], (0, 2, 1, 3)).astype(jnp.float32)
                * g[:, 3]
            )
            y = y.reshape(B, L, d_inner)
        else:
            xf = x_.reshape(B, L, d_inner).astype(io_dtype)
            if _surgery == "nogather":
                xs = jnp.broadcast_to(xf[:, None], (B, K, L, d_inner))
            else:
                xs = jnp.take(xf, scan_ids, axis=1)  # (B, K, L, D)

            if _surgery == "noscan":
                y = xs.astype(jnp.float32)
            elif jax.default_backend() != "cpu" and _os.environ.get("TPUIR_FUSED", "1") != "0":
                # Fused-projection kernel without the stripe structure (the
                # H/W-not-multiple-of-scan_len edge case).
                from tpuir.ops.scan_pallas import selective_scan_fused_proj

                y = selective_scan_fused_proj(
                    xs, x_proj_w, dt_w, -jnp.exp(A_logs.astype(jnp.float32)),
                    Ds, dt_b, chunk=max(self.scan_chunk, 256),
                    serving=(io_dtype == jnp.bfloat16),
                )
            else:
                xs = xs.astype(jnp.float32)
                x_dbl = jnp.einsum(
                    "bkld,kcd->bklc", xs, x_proj_w, preferred_element_type=jnp.float32
                )
                dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
                dts = jnp.einsum(
                    "bklr,kdr->bkld", dts, dt_w, preferred_element_type=jnp.float32
                )
                y = selective_scan(
                    xs, dts, -jnp.exp(A_logs.astype(jnp.float32)), Bs, Cs, Ds, dt_b,
                    delta_softplus=True, chunk=self.scan_chunk,
                )  # (B, K, L, D) float32

            pooled = jnp.mean(y, axis=2)  # (B, K, D)
            gates = jax.nn.sigmoid(
                jnp.einsum("bid,doi->bod", pooled, gw) + gb.T[None]
            )  # (B, K, D)
            y = y * gates[:, :, None, :]

            # Inverse NSS gather per direction, then sum the 4 directions.
            y = y.astype(io_dtype)
            if _surgery == "nogather":
                y = jnp.sum(y, axis=1)
            else:
                y = jnp.take_along_axis(y, inv_ids[None, :, :, None], axis=2)
                y = jnp.sum(y, axis=1)  # (B, L, D)

        y = TorchLayerNorm(d_inner, name="out_norm")(y.astype(jnp.float32))
        # Serving mode: the gate product and out_proj input ride bf16 (the
        # matmul casts to bf16 anyway; this halves the elementwise stream's
        # HBM traffic). LN statistics above stay float32.
        y = y.astype(io_dtype) * nn.silu(
            z.reshape(B, L, d_inner).astype(io_dtype)
        )
        y = nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)
        return y.reshape(B, H, W, self.d_model).astype(x.dtype)


class MaIRBlock(nn.Module):
    """RMB (mair_arch.py:346-390) == VSSBlock (mairunet_arch.py:332-380).

    drop_path implements stochastic depth on the attention branch exactly
    like timm's DropPath used by the reference (identity at inference /
    when deterministic): per-sample Bernoulli keep, scaled by 1/keep."""

    dim: int
    d_state: int
    ssm_ratio: float
    mlp_ratio: float
    scan_chunk: int = 256
    drop_path: float = 0.0
    scan_io_dtype: str = "float32"
    scan_len: int = 4

    @nn.compact
    def __call__(self, x, ids, deterministic: bool = True,
                 shift: bool = False):
        h = TorchLayerNorm(self.dim, name="ln_1")(x)
        attn = SSMixer(
            self.dim, self.d_state, self.ssm_ratio, self.scan_chunk,
            scan_len=self.scan_len, scan_io_dtype=self.scan_io_dtype,
            name="self_attention",
        )(h, ids, shift=shift)
        if self.drop_path > 0.0 and not deterministic:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            attn = attn * mask.astype(attn.dtype) / keep
        skip_scale = self.param("skip_scale", nn.initializers.ones, (self.dim,))
        x = x * skip_scale + attn
        h2 = TorchLayerNorm(self.dim, name="ln_2")(x)
        skip_scale2 = self.param("skip_scale2", nn.initializers.ones, (self.dim,))
        x = x * skip_scale2 + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(h2)
        return x


class MaIR(nn.Module):
    """Flat MaIR for gaussian color denoising (mair_arch.py:493-730,
    denoising branch: upsampler=None)."""

    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    d_state: int = 16
    ssm_ratio: float = 1.3
    mlp_ratio: float = 2.0
    scan_len: int = 4
    img_range: float = 1.0
    scan_chunk: int = 256
    drop_path_rate: float = 0.0  # stochastic depth (reference default 0.1)
    scan_io_dtype: str = "float32"  # 'bfloat16' = serving mode scan IO

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.in_chans == 3:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        else:
            mean = jnp.zeros((self.in_chans,), x.dtype)
        x = (x - mean) * self.img_range

        xf = nn.Conv(self.embed_dim, (3, 3), padding=1, name="conv_first")(x)
        B, H, W, _ = xf.shape
        ids, shift_ids = scan_ids_for(H, W, self.scan_len)

        h = TorchLayerNorm(self.embed_dim, name="patch_embed_norm")(xf)
        total_depth = sum(self.depths)
        dpr = [
            self.drop_path_rate * d / max(total_depth - 1, 1)
            for d in range(total_depth)
        ]  # linspace decay rule (mair_arch.py:592)
        blk_idx = 0
        for i, depth in enumerate(self.depths):
            g_in = h
            for j in range(depth):
                blk = MaIRBlock(
                    self.embed_dim, self.d_state, self.ssm_ratio, self.mlp_ratio,
                    self.scan_chunk, drop_path=dpr[blk_idx],
                    scan_io_dtype=self.scan_io_dtype, scan_len=self.scan_len,
                    name=f"layers_{i}_blocks_{j}",
                )
                blk_idx += 1
                h = blk(h, shift_ids if j % 2 else ids, deterministic,
                        shift=bool(j % 2))
            h = nn.Conv(self.embed_dim, (3, 3), padding=1, name=f"layers_{i}_conv")(h)
            h = h + g_in
        h = TorchLayerNorm(self.embed_dim, name="norm")(h)

        res = nn.Conv(self.embed_dim, (3, 3), padding=1, name="conv_after_body")(h) + xf
        x = x + nn.Conv(self.in_chans, (3, 3), padding=1, name="conv_last")(res)
        return x / self.img_range + mean


# ---------------------------------------------------------------------------
# Weight conversion
# ---------------------------------------------------------------------------


def _f32(x):
    return np.asarray(x, np.float32)


def _conv_p(sd, name):
    return {
        "kernel": np.ascontiguousarray(_f32(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)),
        "bias": _f32(sd[f"{name}.bias"]),
    }


def _dense_p(sd, name, bias=True):
    p = {"kernel": np.ascontiguousarray(_f32(sd[f"{name}.weight"]).T)}
    if bias:
        p["bias"] = _f32(sd[f"{name}.bias"])
    return p


def _ln_p(sd, name):
    return {"weight": _f32(sd[f"{name}.weight"]), "bias": _f32(sd[f"{name}.bias"])}


def convert_ssmixer(sd: Dict[str, np.ndarray], t: str, d_inner: int) -> Dict:
    """VMM / LoSh2D parameters (torch prefix ``t``)."""
    K = 4
    gw = _f32(sd[f"{t}.gating.gating.1.weight"])  # (4*d_inner, 4, 1, 1)
    gb = _f32(sd[f"{t}.gating.gating.1.bias"])  # (4*d_inner,)
    A_logs = _f32(sd[f"{t}.A_logs"]).reshape(K, d_inner, -1)
    return {
        "in_proj": _dense_p(sd, f"{t}.in_proj", bias=False),
        "conv2d": _conv_p(sd, f"{t}.conv2d"),
        "x_proj_weight": _f32(sd[f"{t}.x_proj_weight"]),
        "dt_projs_weight": _f32(sd[f"{t}.dt_projs_weight"]),
        "dt_projs_bias": _f32(sd[f"{t}.dt_projs_bias"]),
        "A_logs": A_logs,
        "Ds": _f32(sd[f"{t}.Ds"]).reshape(K, d_inner),
        "gate_weight": gw.reshape(d_inner, K, K),
        "gate_bias": gb.reshape(d_inner, K),
        "out_norm": _ln_p(sd, f"{t}.out_norm"),
        "out_proj": _dense_p(sd, f"{t}.out_proj", bias=False),
    }


def convert_block(sd: Dict[str, np.ndarray], t: str, d_inner: int, mlp_attr: str) -> Dict:
    """RMB (mlp_attr='conv_blk') / VSSBlock (mlp_attr='mlp')."""
    return {
        "ln_1": _ln_p(sd, f"{t}.ln_1"),
        "ln_2": _ln_p(sd, f"{t}.ln_2"),
        "skip_scale": _f32(sd[f"{t}.skip_scale"]),
        "skip_scale2": _f32(sd[f"{t}.skip_scale2"]),
        "self_attention": convert_ssmixer(sd, f"{t}.self_attention", d_inner),
        "mlp": {
            "fc1": _dense_p(sd, f"{t}.{mlp_attr}.fc1"),
            "fc2": _dense_p(sd, f"{t}.{mlp_attr}.fc2"),
        },
    }


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6),
    embed_dim: int = 180,
    ssm_ratio: float = 1.3,
) -> Dict:
    d_inner = int(ssm_ratio * embed_dim)
    params: Dict[str, Any] = {
        "conv_first": _conv_p(sd, "conv_first"),
        "patch_embed_norm": _ln_p(sd, "patch_embed.norm"),
        "norm": _ln_p(sd, "norm"),
        "conv_after_body": _conv_p(sd, "conv_after_body"),
        "conv_last": _conv_p(sd, "conv_last"),
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            params[f"layers_{i}_blocks_{j}"] = convert_block(
                sd, f"layers.{i}.residual_group.blocks.{j}", d_inner, "conv_blk"
            )
        params[f"layers_{i}_conv"] = _conv_p(sd, f"layers.{i}.conv")
    return {"params": params}
