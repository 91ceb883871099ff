"""Fused mixer epilogue (tpuir/ops/nss_epilogue.py) vs the XLA tail it
replaces: combine_halves -> out_norm -> SiLU(z) gate -> out_proj
(models/mair.py SSMixer tail; reference mair_arch.py:287-294)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuir.ops import nss_epilogue as E


def _operands(B=1, H=8, W=8, Di=12, Dm=10, shift=False, seed=0):
    """Random keep_pad-shaped buffers with ZERO padded channels (the
    invariant the real kernel provides)."""
    rng = np.random.RandomState(seed)
    Dp = Di + (-Di) % 128

    def buf(shape):
        a = np.zeros(shape + (Dp,), np.float32)
        a[..., :Di] = rng.randn(*shape, Di) * 0.5
        return jnp.asarray(a)

    oL01 = buf((B, 2, W, H))
    oR01 = buf((B, 2, W, H))
    oL23 = buf((B, 2, H, W))
    oR23 = buf((B, 2, H, W))
    gates = jnp.asarray(rng.rand(B, 4, Di), jnp.float32)
    z = buf((B, H, W))
    ln_w = jnp.asarray(rng.randn(Di) * 0.2 + 1.0, jnp.float32)
    ln_b = jnp.asarray(rng.randn(Di) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.randn(Di, Dm) * 0.1, jnp.float32)
    return oL01, oR01, oL23, oR23, gates, z, ln_w, ln_b, w_out, Di


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("row_block", [4, 32])
def test_epilogue_matches_reference(shift, row_block):
    *args, Di = _operands(shift=shift)
    got = E.mixer_epilogue(*args, Di, shift=shift, scan_len=4,
                           interpret=True, row_block=row_block)
    want = E._reference(*args, Di, shift, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_epilogue_grad_matches_reference():
    *args, Di = _operands(H=8, W=8, Di=8, Dm=6, seed=2)

    def f_kernel(*a):
        return jnp.sum(E.mixer_epilogue(*a, Di, interpret=True) ** 2)

    def f_ref(*a):
        return jnp.sum(E._reference(*a, Di, False, 4) ** 2)

    g_k = jax.grad(f_kernel, argnums=tuple(range(9)))(*args)
    g_r = jax.grad(f_ref, argnums=tuple(range(9)))(*args)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("shift", [False, True])
def test_ssmixer_epilogue_path_matches_fallback(monkeypatch, shift):
    """Full mixer, interpret: prologue+epilogue vs prologue-only vs plain."""
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
    ids = M.scan_ids_for(8, 8, 4)[1 if shift else 0]

    m = OneMixer()
    monkeypatch.setenv("TPUIR_PROLOGUE", "0")
    monkeypatch.setenv("TPUIR_EPILOGUE", "0")
    params = m.init(jax.random.PRNGKey(0), x, ids)
    y_plain = np.asarray(m.apply(params, x, ids, shift=shift))
    monkeypatch.setenv("TPUIR_PROLOGUE", "1")
    y_pro = np.asarray(m.apply(params, x, ids, shift=shift))
    monkeypatch.setenv("TPUIR_EPILOGUE", "1")
    y_epi = np.asarray(m.apply(params, x, ids, shift=shift))
    np.testing.assert_allclose(y_pro, y_plain, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(y_epi, y_plain, atol=5e-5, rtol=1e-4)


def test_ssmixer_epilogue_init_tree_unchanged(monkeypatch):
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
    monkeypatch.setenv("TPUIR_EPILOGUE", "0")
    t0 = jax.tree_util.tree_structure(m.init(jax.random.PRNGKey(0), x, ids))
    monkeypatch.setenv("TPUIR_PROLOGUE", "1")
    monkeypatch.setenv("TPUIR_EPILOGUE", "1")
    t1 = jax.tree_util.tree_structure(m.init(jax.random.PRNGKey(0), x, ids))
    assert t0 == t1


def test_pick_row_block_vmem_guard():
    """Same regression as tests/test_nss_prologue.py: the f32 parity path
    at the MaIR-CDN@128 shape (RB=32) measured 103.0 MB scoped VMEM vs
    the 101.6 MB limit — the picker must back off in parity mode while
    keeping the measured serving choice."""
    from tpuir.ops.nss_epilogue import _pick_row_block

    # serving keeps the default RB=32 at 128px (Dm=180 for MaIR-CDN)
    assert _pick_row_block(128, 128, 256, 180, True, 32) == 32
    # parity must back off below the OOM point
    assert _pick_row_block(128, 128, 256, 180, False, 32) <= 16
    assert 96 % _pick_row_block(96, 96, 256, 180, False, 32) == 0
