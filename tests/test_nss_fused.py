"""Gather-fused NSS scan kernel == the XLA gather+scan composition.

The kernel replaces the reference's index-array gathers
(/root/reference/src/mair/basicsr/archs/shift_scanf_util.py:207-245) with
stripe BlockSpecs + in-VMEM involutions; these tests pin that the
permutation structure, the shifted variant's pad handling, the pooled
sums, and the custom-vjp backward all agree with the explicit
``jnp.take``-based composition (itself oracle-tested elsewhere).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuir.ops.nss_fused import _reference, nss_scan_fused

jax.config.update("jax_enable_x64", False)


def make_inputs(B=2, H=8, W=12, d=8, n=4, r=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, d).astype(np.float32) * 0.5)
    wxp = jnp.asarray(rng.randn(4, r + 2 * n, d).astype(np.float32) * 0.3)
    wdt = jnp.asarray(rng.randn(4, d, r).astype(np.float32) * 0.3)
    A = -jnp.exp(jnp.asarray(rng.randn(4, d, n).astype(np.float32) * 0.3))
    D = jnp.asarray(rng.randn(4, d).astype(np.float32))
    bias = jnp.asarray(rng.randn(4, d).astype(np.float32) * 0.2)
    return x, wxp, wdt, A, D, bias


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("hw", [(8, 12), (12, 8), (16, 16)])
def test_matches_reference(shift, hw):
    H, W = hw
    args = make_inputs(H=H, W=W)
    y01, y23, pooled = nss_scan_fused(*args, shift=shift, interpret=True)
    r01, r23, rpool = _reference(*args, scan_len=4, shift=shift)
    np.testing.assert_allclose(np.asarray(y01), np.asarray(r01),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y23), np.asarray(r23),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(rpool),
                               rtol=2e-4, atol=2e-4)


def test_y23_layout_is_transposed_image():
    """y23[b, k, w, h] is the direction-(k+2) output for pixel (h, w)."""
    args = make_inputs(H=8, W=12, seed=3)
    _, y23, _ = nss_scan_fused(*args, interpret=True)
    _, r23, _ = _reference(*args, scan_len=4, shift=False)
    assert y23.shape == (2, 2, 12, 8, 8)
    np.testing.assert_allclose(np.asarray(y23), np.asarray(r23),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [False, True])
def test_backward_matches_reference(shift):
    args = make_inputs(B=1, H=8, W=8, d=4, n=2, r=2, seed=7)

    def loss_fused(*a):
        y01, y23, pooled = nss_scan_fused(*a, shift=shift, interpret=True)
        return (jnp.sum(jnp.sin(y01)) + jnp.sum(jnp.cos(y23))
                + jnp.sum(pooled * 0.1))

    def loss_ref(*a):
        y01, y23, pooled = _reference(*a, scan_len=4, shift=shift)
        return (jnp.sum(jnp.sin(y01)) + jnp.sum(jnp.cos(y23))
                + jnp.sum(pooled * 0.1))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_validation():
    args = make_inputs()
    with pytest.raises(ValueError):
        nss_scan_fused(*args, scan_len=3, interpret=True)
    with pytest.raises(ValueError):
        nss_scan_fused(*args, vert_p=12, interpret=True)
    bad = (args[0][:, :, :10],) + args[1:]  # W=10 not a multiple of 4
    with pytest.raises(ValueError):
        nss_scan_fused(*bad, interpret=True)
