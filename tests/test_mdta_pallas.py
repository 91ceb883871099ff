"""Fused MDTA core kernel (interpret mode on CPU) vs the XLA twin and the
torch reference attention math."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuir.ops import mdta_pallas


def _interp_core(qkv, temp, heads, l_tile):
    """Run the pallas kernel in interpreter mode (CPU tests)."""
    import functools
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        fn = mdta_pallas.mdta_core.__wrapped__  # undo jit to pick up the patch
        return fn(qkv, temp, heads, l_tile)


@pytest.mark.parametrize("b,L,heads,hc,l_tile", [
    (1, 64, 1, 8, 16),
    (2, 100, 2, 8, 32),   # L not divisible by tile
    (1, 256, 4, 16, 64),
])
def test_kernel_matches_xla_twin(b, L, heads, hc, l_tile):
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(b, L, 3, heads, hc).astype(np.float32))
    temp = jnp.asarray(rng.rand(heads, 1, 1).astype(np.float32) + 0.5)
    want = mdta_pallas.mdta_core_reference(qkv, temp, heads)
    got = _interp_core(qkv, temp, heads, l_tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_xla_twin_matches_torch_attention():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    b, L, heads, hc = 1, 48, 2, 8
    qkv = rng.randn(b, L, 3, heads, hc).astype(np.float32)
    temp = (rng.rand(heads, 1, 1) + 0.5).astype(np.float32)

    got = np.asarray(
        mdta_pallas.mdta_core_reference(jnp.asarray(qkv), jnp.asarray(temp), heads)
    )

    # torch restatement of restormer.py:111-132 on pre-split heads
    q = torch.from_numpy(qkv[:, :, 0]).permute(0, 2, 3, 1)  # b, heads, hc, L
    k = torch.from_numpy(qkv[:, :, 1]).permute(0, 2, 3, 1)
    v = torch.from_numpy(qkv[:, :, 2]).permute(0, 2, 3, 1)
    q = torch.nn.functional.normalize(q, dim=-1)
    k = torch.nn.functional.normalize(k, dim=-1)
    attn = (q @ k.transpose(-2, -1)) * torch.from_numpy(temp)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).permute(0, 3, 1, 2).numpy()  # b, L, heads, hc
    np.testing.assert_allclose(got, out, atol=1e-5, rtol=1e-4)
