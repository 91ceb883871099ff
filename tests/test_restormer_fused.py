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
