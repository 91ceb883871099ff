"""Fused-kernel Restormer (interpret mode) vs the Flax module."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuir.models import restormer as jres
from tpuir.models import restormer_fused as fused


@pytest.mark.parametrize("ln_bias,dual", [(False, False), (True, True)])
def test_fused_model_matches_module(ln_bias, dual):
    in_ch = 6 if dual else 3
    model = jres.Restormer(
        inp_channels=in_ch, out_channels=3 if dual else in_ch, dim=8,
        num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 2, 4, 8),
        layer_norm_bias=ln_bias, dual_pixel_task=dual,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 24, in_ch).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    got = np.asarray(
        fused.apply(
            params, x, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
            ln_bias=ln_bias, dual_pixel_task=dual, row_tile=8, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_fused_io_bf16_tracks_f32():
    """io_bf16=True (bf16 inter-block activations) stays within bf16
    rounding of the float32-IO path on a tiny config."""
    model = jres.Restormer(
        dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        heads=(1, 2, 4, 8),
    )
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 24, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    kw = dict(num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
              ln_bias=True, row_tile=8, interpret=True)
    want = np.asarray(fused.apply(params, x, **kw))
    got = np.asarray(fused.apply(params, x, io_bf16=True, **kw))
    scale = np.abs(want).std() + np.abs(want).mean()
    assert (np.abs(got - want) / scale).max() < 0.05
