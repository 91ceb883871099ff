"""Stochastic depth (DropPath) in MaIR training mode."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuir.models.mair import MaIR


def _model(dpr):
    return MaIR(
        embed_dim=16, depths=(2,), d_state=2, ssm_ratio=1.5, mlp_ratio=1.0,
        scan_len=4, scan_chunk=16, drop_path_rate=dpr,
    )


def test_deterministic_ignores_drop_path():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
    m0 = _model(0.0)
    params = m0.init(jax.random.PRNGKey(0), x)
    y0 = m0.apply(params, x)
    y1 = _model(0.5).apply(params, x)  # deterministic default: identical
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_training_mode_drops_branches():
    x = jnp.asarray(np.random.RandomState(1).rand(8, 8, 8, 3).astype(np.float32))
    m = _model(0.5)
    params = m.init(jax.random.PRNGKey(0), x)
    outs = [
        np.asarray(
            m.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(s)})
        )
        for s in (1, 2, 3)
    ]
    # with p=0.5 over batch 8, different rngs give different masks
    assert sum(
        not np.array_equal(outs[i], outs[j])
        for i in range(3) for j in range(i + 1, 3)
    ) >= 2
    det = np.asarray(m.apply(params, x))
    assert any(not np.array_equal(o, det) for o in outs)
