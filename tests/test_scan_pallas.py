"""Pallas selective-scan kernel (interpret mode) vs the XLA blocked scan."""

import numpy as np
import pytest

from tpuir.ops.selective_scan import selective_scan
from tpuir.ops.scan_pallas import selective_scan_fused_proj, selective_scan_pallas
from tests.test_selective_scan import _random_case


@pytest.mark.parametrize(
    "b,k,L,d,n,chunk,d_tile",
    [
        (1, 2, 64, 8, 4, 16, 8),
        (2, 4, 100, 12, 5, 32, 8),  # ragged L and D
        (1, 4, 256, 24, 16, 64, 16),
    ],
)
def test_pallas_scan_matches_xla(b, k, L, d, n, chunk, d_tile):
    rng = np.random.RandomState(0)
    u, delta, A, B, C, D, bias = _random_case(rng, b=b, k=k, L=L, d=d, n=n)
    want = np.asarray(selective_scan(u, delta, A, B, C, D, bias, chunk=chunk))
    got = np.asarray(
        selective_scan_pallas(
            u, delta, A, B, C, D, bias, chunk=chunk, d_tile=d_tile, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("algo,n,d", [
    ("pairs", 4, 24),
    ("vert", 4, 24),
    ("vert", 32, 40),  # MaIRUNet level-3 shape class: d_state 32
])
def test_fused_proj_matches_composition(algo, n, d):
    from tpuir.ops.scan_pallas import selective_scan_fused_proj
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    b, k, L, r = 1, 4, 64, 2
    xs = rng.randn(b, k, L, d).astype(np.float32)
    wxp = (rng.randn(k, r + 2 * n, d) * 0.2).astype(np.float32)
    wdt = (rng.randn(k, d, r) * 0.2).astype(np.float32)
    A = -np.exp(rng.randn(k, d, n).astype(np.float32) * 0.3)
    D = rng.randn(k, d).astype(np.float32)
    bias = (rng.randn(k, d) * 0.2).astype(np.float32)

    # composition: einsum projections then the reference scan
    xdbl = np.einsum("bkld,kcd->bklc", xs, wxp)
    dts = np.einsum("bklr,kdr->bkld", xdbl[..., :r], wdt)
    Bs = xdbl[..., r : r + n]
    Cs = xdbl[..., r + n :]
    want = np.asarray(selective_scan(xs, dts, A, Bs, Cs, D, bias, chunk=16))

    got = np.asarray(
        selective_scan_fused_proj(
            xs, wxp, wdt, A, D, bias, chunk=16, algo=algo, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_fused_proj_serving_mode_close():
    """serving=True (bf16 projections + bf16 level storage) must track the
    parity kernel within bf16 rounding compounded over the scan horizon."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    B, K, L, D, N, R = 1, 2, 128, 32, 4, 2
    xs = jnp.asarray(rng.rand(B, K, L, D), jnp.float32)
    wxp = jnp.asarray(rng.randn(K, R + 2 * N, D) * 0.2, jnp.float32)
    wdt = jnp.asarray(rng.randn(K, D, R) * 0.2, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.rand(K, D, N), jnp.float32))
    Ds = jnp.ones((K, D), jnp.float32)
    db = jnp.zeros((K, D), jnp.float32)

    want = np.asarray(
        selective_scan_fused_proj(xs, wxp, wdt, A, Ds, db, chunk=32,
                                  interpret=True)
    )
    got = np.asarray(
        selective_scan_fused_proj(xs, wxp, wdt, A, Ds, db, chunk=32,
                                  serving=True, interpret=True)
    )
    scale = np.abs(want).std() + np.abs(want).mean()
    rel = np.abs(got - want) / scale
    assert rel.max() < 0.08, rel.max()
    assert rel.mean() < 0.01, rel.mean()


def test_fused_proj_gradients_match_composition():
    """jax.grad flows through the fused kernel via the custom_vjp (the
    backward differentiates the einsum+selective_scan composition), so
    TPU training of MaIR through the fused path has correct gradients."""
    import jax
    import jax.numpy as jnp

    from tpuir.ops.scan_pallas import (
        _reference_composition,
        selective_scan_fused_proj,
    )

    rng = np.random.RandomState(5)
    b, k, L, d, n, r = 1, 2, 32, 16, 4, 2
    args = (
        jnp.asarray(rng.randn(b, k, L, d), jnp.float32),
        jnp.asarray(rng.randn(k, r + 2 * n, d) * 0.2, jnp.float32),
        jnp.asarray(rng.randn(k, d, r) * 0.2, jnp.float32),
        jnp.asarray(-np.exp(rng.randn(k, d, n) * 0.3), jnp.float32),
        jnp.asarray(rng.randn(k, d), jnp.float32),
        jnp.asarray(rng.randn(k, d) * 0.2, jnp.float32),
    )

    def loss_fused(*a):
        return jnp.sum(jnp.sin(
            selective_scan_fused_proj(*a, chunk=16, interpret=True)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_reference_composition(*a, chunk=16)))

    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for got, want in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3)
