"""Fused mixer prologue (tpuir/ops/nss_prologue.py) vs the XLA composition
it replaces: in_proj -> chunk -> depthwise 3x3 -> SiLU -> pad -> transpose
(/root/reference/src/mair/basicsr/archs/mair_arch.py:277-284)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuir.ops import nss_prologue as P


def _operands(B=1, H=16, W=16, Dm=20, Di=28, seed=0):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(B, H, W, Dm) * 0.5, jnp.float32)
    w_in = jnp.asarray(rng.randn(Dm, 2 * Di) * 0.1, jnp.float32)
    ck = jnp.asarray(rng.randn(3, 3, 1, Di) * 0.2, jnp.float32)
    cb = jnp.asarray(rng.randn(Di) * 0.05, jnp.float32)
    return h, w_in, ck, cb, Di


@pytest.mark.parametrize("row_block", [4, 8, 64])
def test_prologue_matches_reference(row_block):
    h, w_in, ck, cb, Di = _operands()
    xp, xpT, z = P.mixer_prologue(
        h, w_in, ck, cb, Di, interpret=True, row_block=row_block
    )
    rxp, rxpT, rz = P._reference(h, w_in, ck, cb, Di)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(rxp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xpT), np.asarray(rxpT), atol=2e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(rz), atol=2e-5)


def test_prologue_nonsquare_and_odd_blocks():
    # H=24 with row_block=16 forces the RB halving loop (24 % 16 != 0)
    h, w_in, ck, cb, Di = _operands(B=2, H=24, W=16, Dm=12, Di=12, seed=3)
    xp, xpT, z = P.mixer_prologue(
        h, w_in, ck, cb, Di, interpret=True, row_block=16
    )
    rxp, rxpT, rz = P._reference(h, w_in, ck, cb, Di)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(rxp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xpT), np.asarray(rxpT), atol=2e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(rz), atol=2e-5)


def test_prologue_channel_padding_zero():
    h, w_in, ck, cb, Di = _operands(Di=28)
    xp, _, _ = P.mixer_prologue(h, w_in, ck, cb, Di, interpret=True)
    assert xp.shape[-1] == 128
    np.testing.assert_array_equal(np.asarray(xp[..., Di:]), 0.0)


def test_prologue_grad_matches_reference():
    h, w_in, ck, cb, Di = _operands(H=8, W=8, Dm=8, Di=8, seed=1)

    def f_pro(h, w, k, b):
        xp, xpT, z = P.mixer_prologue(h, w, k, b, Di, interpret=True)
        return (jnp.sum(xp ** 2) + jnp.sum(xpT * 0.5) + jnp.sum(jnp.abs(z)))

    def f_ref(h, w, k, b):
        xp, xpT, z = P._reference(h, w, k, b, Di)
        return (jnp.sum(xp ** 2) + jnp.sum(xpT * 0.5) + jnp.sum(jnp.abs(z)))

    g_pro = jax.grad(f_pro, argnums=(0, 1, 2, 3))(h, w_in, ck, cb)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(h, w_in, ck, cb)
    for a, b in zip(g_pro, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ssmixer_prologue_path_matches_fallback(monkeypatch):
    """Full mixer, interpret mode: the prologue+stripe-pre path must match
    the plain in_proj/conv + stripe path on the same params."""
    from tpuir.models import mair as M

    monkeypatch.setenv("TPUIR_FUSED_INTERPRET", "1")
    monkeypatch.setenv("TPUIR_NSS", "stripe")

    class OneMixer(M.nn.Module):
        @M.nn.compact
        def __call__(self, x, ids, shift=False):
            return M.SSMixer(16, d_state=4, expand=2.0, scan_len=4,
                             name="mix")(x, ids, shift=shift)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 16), jnp.float32)
    ids = M.scan_ids_for(8, 8, 4)[0]

    m = OneMixer()
    monkeypatch.setenv("TPUIR_PROLOGUE", "0")
    params = m.init(jax.random.PRNGKey(0), x, ids)
    y_plain = np.asarray(m.apply(params, x, ids))
    monkeypatch.setenv("TPUIR_PROLOGUE", "1")
    y_pro = np.asarray(m.apply(params, x, ids))
    np.testing.assert_allclose(y_pro, y_plain, atol=5e-5, rtol=1e-4)

    # shifted variant
    ids_s = M.scan_ids_for(8, 8, 4)[1]
    monkeypatch.setenv("TPUIR_PROLOGUE", "0")
    y_plain_s = np.asarray(m.apply(params, x, ids_s, shift=True))
    monkeypatch.setenv("TPUIR_PROLOGUE", "1")
    y_pro_s = np.asarray(m.apply(params, x, ids_s, shift=True))
    np.testing.assert_allclose(y_pro_s, y_plain_s, atol=5e-5, rtol=1e-4)


def test_ssmixer_prologue_init_tree_unchanged(monkeypatch):
    """init() under the prologue path must create the exact same parameter
    tree as the fallback (DenseParams/ConvParams name compatibility)."""
    from tpuir.models import mair as M

    monkeypatch.setenv("TPUIR_FUSED_INTERPRET", "1")
    monkeypatch.setenv("TPUIR_NSS", "stripe")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 16), jnp.float32)
    ids = M.scan_ids_for(8, 8, 4)[0]

    class OneMixer(M.nn.Module):
        @M.nn.compact
        def __call__(self, x, ids, shift=False):
            return M.SSMixer(16, d_state=4, expand=2.0, scan_len=4,
                             name="mix")(x, ids, shift=shift)

    m = OneMixer()
    monkeypatch.setenv("TPUIR_PROLOGUE", "0")
    t0 = jax.tree_util.tree_structure(m.init(jax.random.PRNGKey(0), x, ids))
    monkeypatch.setenv("TPUIR_PROLOGUE", "1")
    t1 = jax.tree_util.tree_structure(m.init(jax.random.PRNGKey(0), x, ids))
    assert t0 == t1


def test_pick_row_block_vmem_guard():
    """The row-block picker must be io-dtype-aware: at the MaIR-CDN@128
    shape (W=128, Dmp=Dp=256) the f32 parity path at RB=64 measures
    102.9 MB of scoped VMEM against a 101.6 MB compiler limit (remote
    compile OOM, round 4), while bf16 serving fits. Pin the picks."""
    from tpuir.ops.nss_prologue import _pick_row_block

    # serving keeps the measured-optimal RB=64 at 128px
    assert _pick_row_block(128, 128, 256, 256, True, 64) == 64
    # parity must back off below the OOM point
    assert _pick_row_block(128, 128, 256, 256, False, 64) <= 32
    # large shapes stay at the @384-measured serving choice
    assert _pick_row_block(384, 384, 256, 256, True, 64) == 16
    # picker respects divisibility
    assert 96 % _pick_row_block(96, 96, 256, 256, False, 64) == 0
