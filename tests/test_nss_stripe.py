"""Stripe-resident NSS scan (tpuir/ops/nss_stripe.py) vs the take/inverse
oracle composition — the same semantics the XLA fallback in
tpuir/models/mair.py uses (reference
/root/reference/src/mair/basicsr/archs/shift_scanf_util.py:67-245 +
mair_arch.py:245-275). Runs the Pallas kernel in interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuir.ops.nss_stripe import nss_scan_stripe, combine_halves, _reference


def _rand_inputs(key, B, H, W, d, n, r):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (B, H, W, d), jnp.float32)
    x_proj_w = jax.random.normal(ks[1], (4, r + 2 * n, d), jnp.float32) * 0.3
    dt_w = jax.random.normal(ks[2], (4, d, r), jnp.float32) * 0.3
    A = -jnp.exp(jax.random.normal(ks[3], (4, d, n), jnp.float32) * 0.3)
    D = jax.random.normal(ks[4], (4, d), jnp.float32) * 0.3
    bias = jax.random.normal(ks[5], (4, d), jnp.float32) * 0.3
    return x, x_proj_w, dt_w, A, D, bias


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("H,scan_len", [(8, 4), (16, 4), (16, 8)])
def test_stripe_matches_oracle(shift, H, scan_len):
    B, d, n, r = 2, 6, 3, 2
    W = H
    x, wxp, wdt, A, D, bias = _rand_inputs(
        jax.random.PRNGKey(0), B, H, W, d, n, r
    )
    y_ref, pool_ref = _reference(x, wxp, wdt, A, D, bias, scan_len, shift)

    oL01, oR01, oL23, oR23, pooled = nss_scan_stripe(
        x, wxp, wdt, A, D, bias,
        scan_len=scan_len, shift=shift, serving=False, vert_p=4,
        interpret=True,
    )
    np.testing.assert_allclose(pooled, pool_ref, rtol=2e-5, atol=2e-5)

    # per-direction check via one-hot gates through combine_halves
    for k in range(4):
        g = jnp.zeros((B, 4, d)).at[:, k].set(1.0)
        y_k = combine_halves(oL01, oR01, oL23, oR23, g, shift, scan_len)
        np.testing.assert_allclose(
            y_k, y_ref[:, k], rtol=2e-5, atol=2e-5,
            err_msg=f"direction {k} shift={shift} H={H} SL={scan_len}",
        )

    # gated sum (the production combine)
    g = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(9), (B, 4, d)))
    y = combine_halves(oL01, oR01, oL23, oR23, g, shift, scan_len)
    want = jnp.einsum("bkhwd,bkd->bhwd", y_ref, g)
    np.testing.assert_allclose(y, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("H,W", [(8, 16), (16, 8), (8, 12), (12, 8)])
def test_stripe_rectangular_matches_oracle(shift, H, W):
    """H != W routes through two single-class kernel launches (one per
    direction class — different stripe counts/lengths)."""
    B, d, n, r, SL = 2, 6, 3, 2, 4
    x, wxp, wdt, A, D, bias = _rand_inputs(
        jax.random.PRNGKey(11), B, H, W, d, n, r
    )
    y_ref, pool_ref = _reference(x, wxp, wdt, A, D, bias, SL, shift)
    oL01, oR01, oL23, oR23, pooled = nss_scan_stripe(
        x, wxp, wdt, A, D, bias,
        scan_len=SL, shift=shift, serving=False, vert_p=4, interpret=True,
    )
    assert oL01.shape == (B, 2, W, H, d)
    assert oL23.shape == (B, 2, H, W, d)
    np.testing.assert_allclose(pooled, pool_ref, rtol=2e-5, atol=2e-5)
    for k in range(4):
        g = jnp.zeros((B, 4, d)).at[:, k].set(1.0)
        y_k = combine_halves(oL01, oR01, oL23, oR23, g, shift, SL)
        np.testing.assert_allclose(
            y_k, y_ref[:, k], rtol=2e-5, atol=2e-5,
            err_msg=f"direction {k} shift={shift} {H}x{W}",
        )


@pytest.mark.parametrize("shift", [False, True])
def test_stripe_rectangular_grad_matches_oracle(shift):
    B, H, W, d, n, r, SL = 1, 8, 12, 4, 2, 2, 4
    x, wxp, wdt, A, D, bias = _rand_inputs(
        jax.random.PRNGKey(13), B, H, W, d, n, r
    )
    gates = jax.nn.sigmoid(
        jax.random.normal(jax.random.PRNGKey(14), (B, 4, d))
    )

    def loss_stripe(x, wxp, wdt, A, D, bias):
        out = nss_scan_stripe(
            x, wxp, wdt, A, D, bias, scan_len=SL, shift=shift,
            serving=False, vert_p=4, interpret=True,
        )
        y = combine_halves(*out[:4], gates, shift, SL)
        return jnp.sum(y**2) + jnp.sum(jnp.sin(out[4]))

    def loss_ref(x, wxp, wdt, A, D, bias):
        y_ref, pool = _reference(x, wxp, wdt, A, D, bias, SL, shift)
        y = jnp.einsum("bkhwd,bkd->bhwd", y_ref, gates)
        return jnp.sum(y**2) + jnp.sum(jnp.sin(pool))

    g1 = jax.grad(loss_stripe, argnums=(0, 1, 2, 3, 4, 5))(
        x, wxp, wdt, A, D, bias
    )
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, wxp, wdt, A, D, bias
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("shift", [False, True])
def test_stripe_grad_matches_oracle(shift):
    B, H, d, n, r, SL = 1, 8, 4, 2, 2, 4
    x, wxp, wdt, A, D, bias = _rand_inputs(
        jax.random.PRNGKey(3), B, H, H, d, n, r
    )
    gates = jax.nn.sigmoid(
        jax.random.normal(jax.random.PRNGKey(4), (B, 4, d))
    )

    def loss_stripe(x, wxp, wdt, A, D, bias):
        out = nss_scan_stripe(
            x, wxp, wdt, A, D, bias, scan_len=SL, shift=shift,
            serving=False, vert_p=4, interpret=True,
        )
        y = combine_halves(*out[:4], gates, shift, SL)
        return jnp.sum(y**2) + jnp.sum(jnp.sin(out[4]))

    def loss_ref(x, wxp, wdt, A, D, bias):
        y_ref, pool = _reference(x, wxp, wdt, A, D, bias, SL, shift)
        y = jnp.einsum("bkhwd,bkd->bhwd", y_ref, gates)
        return jnp.sum(y**2) + jnp.sum(jnp.sin(pool))

    g1 = jax.grad(loss_stripe, argnums=(0, 1, 2, 3, 4, 5))(
        x, wxp, wdt, A, D, bias
    )
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, wxp, wdt, A, D, bias
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("shift", [False, True])
def test_stripe_segmented_matches_oracle(monkeypatch, shift):
    """Force G>1 row segments (the large-image VMEM-bounding path) and
    check against the oracle."""
    monkeypatch.setenv("TPUIR_STRIPE_SEG_BYTES", "1")
    B, H, d, n, r, SL = 1, 16, 4, 2, 2, 4
    x, wxp, wdt, A, D, bias = _rand_inputs(
        jax.random.PRNGKey(7), B, H, H, d, n, r
    )
    y_ref, pool_ref = _reference(x, wxp, wdt, A, D, bias, SL, shift)
    out = nss_scan_stripe(
        x, wxp, wdt, A, D, bias, scan_len=SL, shift=shift,
        serving=False, vert_p=8, interpret=True,
    )
    np.testing.assert_allclose(out[4], pool_ref, rtol=2e-5, atol=2e-5)
    for k in range(4):
        g = jnp.zeros((B, 4, d)).at[:, k].set(1.0)
        y_k = combine_halves(*out[:4], g, shift, SL)
        np.testing.assert_allclose(
            y_k, y_ref[:, k], rtol=2e-5, atol=2e-5,
            err_msg=f"segmented direction {k} shift={shift}",
        )


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("H,W", [(8, 8), (8, 12)])
def test_ssmixer_stripe_branch_matches_xla(monkeypatch, shift, H, W):
    """Drive SSMixer through the production stripe branch (interpret mode
    on CPU, square and rectangular) and compare with the XLA gather
    path."""
    from tpuir.models.mair import SSMixer, scan_ids_for

    B, dm = 1, 4
    mixer = SSMixer(d_model=dm, d_state=2, expand=2.0, scan_len=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, dm), jnp.float32)
    ids, shift_ids = scan_ids_for(H, W, 4)
    use = shift_ids if shift else ids
    params = mixer.init(jax.random.PRNGKey(1), x, use, shift)

    monkeypatch.setenv("TPUIR_FUSED", "0")
    y_xla = mixer.apply(params, x, use, shift)
    monkeypatch.setenv("TPUIR_FUSED", "1")
    monkeypatch.setenv("TPUIR_FUSED_INTERPRET", "1")
    monkeypatch.setenv("TPUIR_NSS", "stripe")
    y_stripe = mixer.apply(params, x, use, shift)
    np.testing.assert_allclose(y_stripe, y_xla, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [False, True])
def test_stripe_recur_bf16_close_to_f32(shift):
    """The accuracy-gated bf16 level-1 recurrence stays within bf16-mantissa
    noise of the float32 kernel (serving-mode option; exact parity is
    checked for the f32 path above)."""
    B, H, d, n, r = 1, 16, 6, 3, 2
    x, wxp, wdt, A, D, bias = _rand_inputs(
        jax.random.PRNGKey(3), B, H, H, d, n, r
    )
    kw = dict(scan_len=4, shift=shift, serving=True, vert_p=4,
              interpret=True)
    out32 = nss_scan_stripe(x, wxp, wdt, A, D, bias, **kw)
    outbf = nss_scan_stripe(x, wxp, wdt, A, D, bias, recur_bf16=True, **kw)
    g = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(5), (B, 4, d)))
    y32 = combine_halves(*out32[:4], g, shift, 4)
    ybf = combine_halves(*outbf[:4], g, shift, 4)
    # ~0.4% per bf16 round, short accumulation chains: 3e-2 abs on O(1)
    # activations is the expected envelope, and the f32 path stays exact
    np.testing.assert_allclose(ybf, y32, rtol=0.05, atol=3e-2)
    assert np.abs(np.asarray(ybf - y32)).mean() < 5e-3
    np.testing.assert_allclose(outbf[4], out32[4], rtol=0.05, atol=0.15)
