"""Restormer: 4-level U-Net transformer with MDTA channel attention + GDFN.

TPU-native re-design of the reference architecture
(/root/reference/src/restormer/restormer.py:193-284). All tensors are NHWC;
the MDTA C-by-C attention and GDFN land directly on the MXU as batched
matmuls / convs. Softmax and the attention matmuls accumulate in float32.

Fidelity notes pinned to the reference:
  * LayerNorm acts over the channel axis with biased variance and eps=1e-5;
    the BiasFree variant divides by sqrt(var) WITHOUT mean subtraction in
    the numerator (restormer.py:25-57).
  * q/k are L2-normalized along the token axis with eps=1e-12
    (torch F.normalize, restormer.py:121-122).
  * GELU is the exact erf form (torch F.gelu default), not tanh-approx.
  * Down/Upsample use torch pixel (un)shuffle channel ordering.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpuir.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, torch-parity semantics."""

    dim: int
    use_bias: bool  # WithBias vs BiasFree variant

    @nn.compact
    def __call__(self, x):
        # Moments accumulate in float32 via the reduction dtype — no
        # materialized casts of the (large) activation, so the bf16 perf
        # mode costs no extra memory passes; the fp32 path is unchanged.
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        mu = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32).astype(x.dtype)
        var = jnp.mean(
            (x - mu) ** 2, axis=-1, keepdims=True, dtype=jnp.float32
        ).astype(x.dtype)
        inv = jax.lax.rsqrt(var + jnp.asarray(1e-5, x.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
            return (x - mu) * inv * weight.astype(x.dtype) + bias.astype(x.dtype)
        return x * inv * weight.astype(x.dtype)


class MDTA(nn.Module):
    """Multi-DConv-head transposed (C x C) self-attention."""

    dim: int
    num_heads: int
    use_bias: bool

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        qkv = nn.Conv(self.dim * 3, (1, 1), use_bias=self.use_bias, name="qkv")(x)
        qkv = nn.Conv(
            self.dim * 3,
            (3, 3),
            padding=1,
            feature_group_count=self.dim * 3,
            use_bias=self.use_bias,
            name="qkv_dwconv",
        )(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        head_c = c // self.num_heads
        # (b, h, w, head*c) -> (b, heads, head_c, L): channel axis is
        # head-major, matching the reference's 'b (head c) h w' split.
        def to_heads(t):
            t = t.reshape(b, h * w, self.num_heads, head_c)
            return t.transpose(0, 2, 3, 1)  # b, heads, c, L

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-24))
        k = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, axis=-1, keepdims=True), 1e-24))

        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1)
        )
        # attn is tiny (C/heads square): fp32 softmax costs nothing. The
        # out-projection einsum writes directly in the compute dtype (MXU
        # still accumulates fp32 internally).
        attn = jnp.einsum(
            "bhcl,bhdl->bhcd", q, k, preferred_element_type=jnp.float32
        ) * temperature
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhcd,bhdl->bhcl", attn, v, preferred_element_type=x.dtype)

        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias, name="project_out")(out)


class GDFN(nn.Module):
    """Gated-DConv feed-forward network."""

    dim: int
    expansion: float
    use_bias: bool

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        x = nn.Conv(hidden * 2, (1, 1), use_bias=self.use_bias, name="project_in")(x)
        x = nn.Conv(
            hidden * 2,
            (3, 3),
            padding=1,
            feature_group_count=hidden * 2,
            use_bias=self.use_bias,
            name="dwconv",
        )(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = nn.gelu(x1, approximate=False) * x2
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias, name="project_out")(x)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: float
    use_bias: bool
    ln_bias: bool

    @nn.compact
    def __call__(self, x):
        x = x + MDTA(self.dim, self.num_heads, self.use_bias, name="attn")(
            ChannelLayerNorm(self.dim, self.ln_bias, name="norm1")(x)
        )
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn")(
            ChannelLayerNorm(self.dim, self.ln_bias, name="norm2")(x)
        )
        return x


class Downsample(nn.Module):
    n_feat: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.n_feat // 2, (3, 3), padding=1, use_bias=False, name="conv")(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    n_feat: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.n_feat * 2, (3, 3), padding=1, use_bias=False, name="conv")(x)
        return pixel_shuffle(x, 2)


class Restormer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    layer_norm_bias: bool = True  # 'WithBias' (deblurring) vs 'BiasFree' (denoising)
    dual_pixel_task: bool = False

    def _blocks(self, n, dim, heads, prefix):
        return [
            TransformerBlock(
                dim, heads, self.ffn_expansion_factor, self.bias, self.layer_norm_bias,
                name=f"{prefix}_{i}",
            )
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, x):
        d = self.dim
        nb = self.num_blocks
        hd = self.heads

        feat1 = nn.Conv(d, (3, 3), padding=1, use_bias=False, name="patch_embed")(x)
        e1 = feat1
        for blk in self._blocks(nb[0], d, hd[0], "encoder_level1"):
            e1 = blk(e1)

        e2 = Downsample(d, name="down1_2")(e1)
        for blk in self._blocks(nb[1], d * 2, hd[1], "encoder_level2"):
            e2 = blk(e2)

        e3 = Downsample(d * 2, name="down2_3")(e2)
        for blk in self._blocks(nb[2], d * 4, hd[2], "encoder_level3"):
            e3 = blk(e3)

        lat = Downsample(d * 4, name="down3_4")(e3)
        for blk in self._blocks(nb[3], d * 8, hd[3], "latent"):
            lat = blk(lat)

        d3 = Upsample(d * 8, name="up4_3")(lat)
        d3 = jnp.concatenate([d3, e3], axis=-1)
        d3 = nn.Conv(d * 4, (1, 1), use_bias=self.bias, name="reduce_chan_level3")(d3)
        for blk in self._blocks(nb[2], d * 4, hd[2], "decoder_level3"):
            d3 = blk(d3)

        d2 = Upsample(d * 4, name="up3_2")(d3)
        d2 = jnp.concatenate([d2, e2], axis=-1)
        d2 = nn.Conv(d * 2, (1, 1), use_bias=self.bias, name="reduce_chan_level2")(d2)
        for blk in self._blocks(nb[1], d * 2, hd[1], "decoder_level2"):
            d2 = blk(d2)

        d1 = Upsample(d * 2, name="up2_1")(d2)
        d1 = jnp.concatenate([d1, e1], axis=-1)
        for blk in self._blocks(nb[0], d * 2, hd[0], "decoder_level1"):
            d1 = blk(d1)
        for blk in self._blocks(self.num_refinement_blocks, d * 2, hd[0], "refinement"):
            d1 = blk(d1)

        if self.dual_pixel_task:
            d1 = d1 + nn.Conv(d * 2, (1, 1), use_bias=self.bias, name="skip_conv")(feat1)
            out = nn.Conv(
                self.out_channels, (3, 3), padding=1, use_bias=self.bias, name="output"
            )(d1)
        else:
            out = nn.Conv(
                self.out_channels, (3, 3), padding=1, use_bias=self.bias, name="output"
            )(d1) + x
        return out


# ---------------------------------------------------------------------------
# Weight conversion from the released torch checkpoints ({'params': sd}).
# ---------------------------------------------------------------------------


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).transpose(2, 3, 1, 0))


def _conv(sd: Dict[str, np.ndarray], torch_name: str, use_bias: bool) -> Dict:
    p = {"kernel": _oihw_to_hwio(sd[f"{torch_name}.weight"])}
    if use_bias:
        p["bias"] = np.asarray(sd[f"{torch_name}.bias"], np.float32)
    return p


def _block(sd, tname: str, use_bias: bool, ln_bias: bool) -> Dict:
    norm = lambda n: (  # noqa: E731
        {"weight": np.asarray(sd[f"{tname}.{n}.body.weight"], np.float32)}
        | (
            {"bias": np.asarray(sd[f"{tname}.{n}.body.bias"], np.float32)}
            if ln_bias
            else {}
        )
    )
    return {
        "norm1": norm("norm1"),
        "norm2": norm("norm2"),
        "attn": {
            "temperature": np.asarray(sd[f"{tname}.attn.temperature"], np.float32),
            "qkv": _conv(sd, f"{tname}.attn.qkv", use_bias),
            "qkv_dwconv": _conv(sd, f"{tname}.attn.qkv_dwconv", use_bias),
            "project_out": _conv(sd, f"{tname}.attn.project_out", use_bias),
        },
        "ffn": {
            "project_in": _conv(sd, f"{tname}.ffn.project_in", use_bias),
            "dwconv": _conv(sd, f"{tname}.ffn.dwconv", use_bias),
            "project_out": _conv(sd, f"{tname}.ffn.project_out", use_bias),
        },
    }


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    num_blocks: Sequence[int] = (4, 6, 6, 8),
    num_refinement_blocks: int = 4,
    bias: bool = False,
    layer_norm_bias: bool = True,
    dual_pixel_task: bool = False,
) -> Dict:
    params: Dict[str, Any] = {}
    params["patch_embed"] = _conv(sd, "patch_embed.proj", False)

    stages = [
        ("encoder_level1", num_blocks[0]),
        ("encoder_level2", num_blocks[1]),
        ("encoder_level3", num_blocks[2]),
        ("latent", num_blocks[3]),
        ("decoder_level3", num_blocks[2]),
        ("decoder_level2", num_blocks[1]),
        ("decoder_level1", num_blocks[0]),
        ("refinement", num_refinement_blocks),
    ]
    for stage, n in stages:
        for i in range(n):
            params[f"{stage}_{i}"] = _block(sd, f"{stage}.{i}", bias, layer_norm_bias)

    for name in ("down1_2", "down2_3", "down3_4", "up4_3", "up3_2", "up2_1"):
        params[name] = {"conv": _conv(sd, f"{name}.body.0", False)}

    params["reduce_chan_level3"] = _conv(sd, "reduce_chan_level3", bias)
    params["reduce_chan_level2"] = _conv(sd, "reduce_chan_level2", bias)
    if dual_pixel_task:
        params["skip_conv"] = _conv(sd, "skip_conv", bias)
    params["output"] = _conv(sd, "output", bias)
    return {"params": params}
