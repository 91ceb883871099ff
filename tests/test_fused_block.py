"""Fused TransformerBlock kernel (interpret mode) vs the Flax module."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuir.models.restormer import TransformerBlock
from tpuir.ops.fused_block import fused_transformer_block


@pytest.mark.parametrize(
    "H,W,C,heads,ln_bias,row_tile",
    [
        (16, 16, 8, 1, False, 8),
        (24, 16, 16, 2, True, 8),
        (20, 24, 16, 4, False, 8),  # H not a multiple of row_tile
        (16, 16, 8, 1, True, 4),
    ],
)
def test_fused_block_matches_module(H, W, C, heads, ln_bias, row_tile):
    blk = TransformerBlock(C, heads, 2.66, False, ln_bias)
    x = jnp.asarray(np.random.RandomState(0).rand(2, H, W, C).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)
    # randomize the temperature so it actually matters
    params = jax.tree_util.tree_map(lambda v: v, params)
    params["params"]["attn"]["temperature"] = jnp.asarray(
        np.random.RandomState(1).rand(heads, 1, 1).astype(np.float32) + 0.5
    )

    want = np.asarray(blk.apply(params, x))
    got = np.asarray(
        fused_transformer_block(
            x, params["params"], heads, ln_bias, row_tile=row_tile, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "H,W,C,heads,ln_bias,pack",
    [
        (16, 16, 8, 1, False, 2),   # the Restormer level-1 shape class
        (24, 16, 16, 2, True, 2),   # multi-head packing
        (16, 16, 8, 2, True, 4),    # pack > 2
    ],
)
def test_fused_block_lane_packed_matches_module(H, W, C, heads, ln_bias, pack):
    """lane_pack runs p images side by side in lanes against block-diagonal
    weights; per-image math must be identical to the unpacked kernel."""
    blk = TransformerBlock(C, heads, 2.66, False, ln_bias)
    B = pack * 2  # two packed groups exercises the grid dimension
    x = jnp.asarray(np.random.RandomState(0).rand(B, H, W, C).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)
    params["params"]["attn"]["temperature"] = jnp.asarray(
        np.random.RandomState(1).rand(heads, 1, 1).astype(np.float32) + 0.5
    )
    want = np.asarray(blk.apply(params, x))
    got = np.asarray(
        fused_transformer_block(
            x, params["params"], heads, ln_bias, row_tile=8,
            lane_pack=pack, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_block_lane_pack_batch_mismatch_raises():
    blk = TransformerBlock(8, 1, 2.66, False, True)
    x = jnp.zeros((3, 16, 16, 8), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="lane_pack"):
        fused_transformer_block(
            x, params["params"], 1, True, lane_pack=2, interpret=True
        )


def test_fused_block_bf16_serving_mode_close():
    """mm_bf16 serving mode: bf16 MXU matmuls with f32 accumulation must
    track the float32 module within bf16 rounding (~0.4% relative)."""
    H, W, C, heads = 16, 16, 16, 2
    blk = TransformerBlock(C, heads, 2.66, False, True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, C).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk.apply(params, x))
    got = np.asarray(
        fused_transformer_block(
            x, params["params"], heads, True, mm_bf16=True, interpret=True
        )
    )
    scale = np.abs(want).std() + np.abs(want).mean()
    err = np.abs(got - want) / scale
    assert err.max() < 0.05, err.max()  # worst case ~2% of signal scale
    assert err.mean() < 5e-3
