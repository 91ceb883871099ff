"""Restormer inference with fused Pallas transformer blocks.

A pure-function twin of tpuir.models.restormer.Restormer that consumes the
exact same converted-checkpoint params pytree, but executes every
TransformerBlock through the fused Pallas kernel
(tpuir/ops/fused_block.py) — LN/attention/GDFN in two streaming passes per
block. Convs and pixel (un)shuffles stay in XLA. Used by the serving path
on TPU; the Flax module remains the training/reference implementation.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from tpuir.ops.fused_block import fused_transformer_block
from tpuir.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


def _conv(p, x, stride=1, groups=1):
    k = p["kernel"]
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride),
        [(k.shape[0] // 2, k.shape[0] // 2), (k.shape[1] // 2, k.shape[1] // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


@partial(
    jax.jit,
    static_argnames=(
        "num_blocks", "num_refinement_blocks", "heads", "ln_bias",
        "dual_pixel_task", "row_tile", "mm_bf16", "io_bf16", "fast_gelu",
        "lane_pack", "batch_inner", "interpret",
    ),
)
def apply(
    params: Dict,
    x: jnp.ndarray,
    num_blocks: Sequence[int] = (4, 6, 6, 8),
    num_refinement_blocks: int = 4,
    heads: Sequence[int] = (1, 2, 4, 8),
    ln_bias: bool = True,
    dual_pixel_task: bool = False,
    row_tile: int = 8,
    mm_bf16: bool = False,
    io_bf16: bool = False,
    fast_gelu: bool = False,
    lane_pack: int = 1,
    batch_inner: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    p = params["params"] if "params" in params else params
    nb = num_blocks
    act_dtype = jnp.bfloat16 if io_bf16 else x.dtype

    def run_stage(h, stage, n, n_heads):
        # lane-pack images through low-C stages (C*pack <= 128 keeps the
        # packed channels inside one MXU/VPU lane tile); at Restormer's
        # level 1 C=48 this roughly doubles lane utilization. Consecutive
        # blocks' unpack/pack transposes cancel in XLA.
        C = h.shape[-1]
        pk = lane_pack
        while pk > 1 and (C * pk > 128 or h.shape[0] % pk):
            pk //= 2
        # clamp the row tile to the stage height: wide tiles only pay off
        # on the big levels, and rt > H would pad the whole image up to rt
        rt = min(row_tile, h.shape[1])
        for i in range(n):
            h = fused_transformer_block(
                h, p[f"{stage}_{i}"], n_heads, ln_bias,
                row_tile=rt, mm_bf16=mm_bf16, fast_gelu=fast_gelu,
                lane_pack=pk, batch_inner=batch_inner, interpret=interpret,
            )
        return h

    # io_bf16: inter-block activations (and their XLA convs / pixel
    # shuffles) ride HBM in bf16 — the fused kernel computes in float32
    # internally either way; halves the streaming passes' IO.
    feat1 = _conv(p["patch_embed"], x).astype(act_dtype)
    e1 = run_stage(feat1, "encoder_level1", nb[0], heads[0])

    e2 = pixel_unshuffle(_conv(p["down1_2"]["conv"], e1), 2)
    e2 = run_stage(e2, "encoder_level2", nb[1], heads[1])

    e3 = pixel_unshuffle(_conv(p["down2_3"]["conv"], e2), 2)
    e3 = run_stage(e3, "encoder_level3", nb[2], heads[2])

    lat = pixel_unshuffle(_conv(p["down3_4"]["conv"], e3), 2)
    lat = run_stage(lat, "latent", nb[3], heads[3])

    d3 = pixel_shuffle(_conv(p["up4_3"]["conv"], lat), 2)
    d3 = jnp.concatenate([d3, e3], axis=-1)
    d3 = _conv(p["reduce_chan_level3"], d3)
    d3 = run_stage(d3, "decoder_level3", nb[2], heads[2])

    d2 = pixel_shuffle(_conv(p["up3_2"]["conv"], d3), 2)
    d2 = jnp.concatenate([d2, e2], axis=-1)
    d2 = _conv(p["reduce_chan_level2"], d2)
    d2 = run_stage(d2, "decoder_level2", nb[1], heads[1])

    d1 = pixel_shuffle(_conv(p["up2_1"]["conv"], d2), 2)
    d1 = jnp.concatenate([d1, e1], axis=-1)
    d1 = run_stage(d1, "decoder_level1", nb[0], heads[0])
    d1 = run_stage(d1, "refinement", num_refinement_blocks, heads[0])

    if dual_pixel_task:
        d1 = d1 + _conv(p["skip_conv"], feat1)
        return _conv(p["output"], d1).astype(jnp.float32)
    return _conv(p["output"], d1).astype(jnp.float32) + x


def make_apply_fn(
    ln_bias: bool, dual_pixel_task: bool = False, row_tile: int = 8,
    mm_bf16: bool = False, io_bf16: bool = False, fast_gelu: bool = False,
    lane_pack: int = 1, batch_inner: bool = False, interpret: bool = False,
    **config,
):
    """apply_fn(params, x) for the engine's InferenceModel.

    ``mm_bf16=True`` selects the serving-precision mode (bf16 MXU matmuls
    with float32 accumulation inside the fused blocks). Extra ``config``
    kwargs (num_blocks, heads, ...) forward to :func:`apply`."""

    def fn(params, x):
        return apply(
            params, x, ln_bias=ln_bias, dual_pixel_task=dual_pixel_task,
            row_tile=row_tile, mm_bf16=mm_bf16, io_bf16=io_bf16,
            fast_gelu=fast_gelu, lane_pack=lane_pack,
            batch_inner=batch_inner, interpret=interpret,
            **config,
        )

    return fn
