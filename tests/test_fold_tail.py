"""Phase-domain FPN tail fold (tpuir/models/deblurgan/fold.py).

The fold must be EXACT (up to the k1+k2 tap pre-summation, ~1 ulp): it
replaces ``clip(tanh(conv3x3(up2(s))) + x, -1, 1)`` — the tail of both
DeblurGANv2 generators (reference fpn_mobilenet.py:144-147,
fpn_inception.py:165-169) — with the same math in the 4-phase
low-resolution layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuir.models.deblurgan.fold import (
    depth_to_space2,
    fold_up2_kernel,
    folded_tail,
    space_to_depth2,
)


def _unfused(low, skip, k, b):
    up = jnp.repeat(jnp.repeat(low, 2, axis=1), 2, axis=2)
    f = jax.lax.conv_general_dilated(
        up, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return jnp.clip(jnp.tanh(f) + skip, -1.0, 1.0)


def test_s2d_d2s_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 6, 10, 3).astype(np.float32))
    x4 = space_to_depth2(x)
    assert x4.shape == (2, 3, 5, 12)
    np.testing.assert_array_equal(np.asarray(depth_to_space2(x4, 3)), np.asarray(x))


@pytest.mark.parametrize("h,w,cin,cout", [(8, 8, 5, 3), (6, 10, 32, 3), (4, 4, 1, 2)])
def test_folded_tail_exact(h, w, cin, cout):
    rng = np.random.RandomState(1)
    low = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    skip = jnp.asarray(rng.randn(2, 2 * h, 2 * w, cout).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    y_ref = np.asarray(_unfused(low, skip, k, b))
    y_fold = np.asarray(folded_tail(low, skip, k, b))
    np.testing.assert_allclose(y_fold, y_ref, rtol=2e-6, atol=2e-6)


def test_fold_up2_kernel_shape_guard():
    with pytest.raises(ValueError):
        fold_up2_kernel(jnp.zeros((5, 5, 4, 3)))


@pytest.mark.parametrize("cls_name,size", [("FPNMobileNet", 64), ("FPNInception", 160)])
def test_model_fold_tail_parity(cls_name, size):
    """fold_tail=True matches fold_tail=False on the full generators, with
    the identical param pytree (converted checkpoints load into either)."""
    from tpuir.models import deblurgan

    cls = getattr(deblurgan, cls_name)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32) * 2 - 1)
    p = cls(fold_tail=False).init(jax.random.PRNGKey(0), x)
    p_fold = cls(fold_tail=True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_fold)
    y_off = np.asarray(cls(fold_tail=False).apply(p, x))
    y_on = np.asarray(cls(fold_tail=True).apply(p, x))
    np.testing.assert_allclose(y_on, y_off, rtol=1e-5, atol=1e-5)


def test_final_tail_module_parity():
    """FinalTail fold on/off agree and share one param pytree."""
    from tpuir.models.deblurgan.fold import FinalTail

    rng = np.random.RandomState(3)
    low = jnp.asarray(rng.randn(1, 5, 7, 4).astype(np.float32))
    skip = jnp.asarray(rng.randn(1, 10, 14, 3).astype(np.float32))
    m_off = FinalTail(3, fold=False)
    p = m_off.init(jax.random.PRNGKey(1), low, skip)
    y_off = np.asarray(m_off.apply(p, low, skip))
    y_on = np.asarray(FinalTail(3, fold=True).apply(p, low, skip))
    np.testing.assert_allclose(y_on, y_off, rtol=2e-6, atol=2e-6)
