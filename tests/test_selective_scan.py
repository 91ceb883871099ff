"""Selective scan vs a float64 NumPy sequential reference and the torch
sequential stand-in used for MaIR oracle tests."""

import numpy as np
import pytest

from tpuir.ops.selective_scan import selective_scan


def numpy_selective_scan(u, delta, A, B, C, D, delta_bias, delta_softplus=True):
    """fp64 sequential reference. u/delta (B,K,L,D); A (K,D,N); B/C (B,K,L,N)."""
    u = u.astype(np.float64)
    dt = delta.astype(np.float64) + delta_bias[None, :, None, :]
    if delta_softplus:
        dt = np.where(dt > 30, dt, np.log1p(np.exp(np.minimum(dt, 30))))
    b, k, L, d = u.shape
    n = A.shape[-1]
    y = np.zeros_like(u)
    for bi in range(b):
        for ki in range(k):
            h = np.zeros((d, n))
            for t in range(L):
                a = np.exp(dt[bi, ki, t][:, None] * A[ki])
                h = a * h + (dt[bi, ki, t] * u[bi, ki, t])[:, None] * B[bi, ki, t][None, :]
                y[bi, ki, t] = h @ C[bi, ki, t] + D[ki] * u[bi, ki, t]
    return y


def _random_case(rng, b=2, k=4, L=37, d=6, n=5):
    u = rng.randn(b, k, L, d).astype(np.float32)
    delta = rng.randn(b, k, L, d).astype(np.float32) * 0.5
    A = -np.exp(rng.randn(k, d, n).astype(np.float32) * 0.3)
    B = rng.randn(b, k, L, n).astype(np.float32)
    C = rng.randn(b, k, L, n).astype(np.float32)
    D = rng.randn(k, d).astype(np.float32)
    bias = rng.randn(k, d).astype(np.float32) * 0.2
    return u, delta, A, B, C, D, bias


@pytest.mark.parametrize("chunk", [8, 16, 256])
def test_selective_scan_vs_fp64_reference(chunk):
    rng = np.random.RandomState(0)
    u, delta, A, B, C, D, bias = _random_case(rng)
    got = np.asarray(selective_scan(u, delta, A, B, C, D, bias, chunk=chunk))
    want = numpy_selective_scan(u, delta, A, B, C, D, bias)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_selective_scan_long_sequence_stability():
    rng = np.random.RandomState(1)
    u, delta, A, B, C, D, bias = _random_case(rng, b=1, k=2, L=4096, d=4, n=4)
    got = np.asarray(selective_scan(u, delta, A, B, C, D, bias, chunk=128))
    want = numpy_selective_scan(u, delta, A, B, C, D, bias)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_selective_scan_matches_torch_standin():
    torch = pytest.importorskip("torch")
    from tests.oracle import selective_scan_sequential_torch

    rng = np.random.RandomState(2)
    u, delta, A, B, C, D, bias = _random_case(rng, b=1, k=4, L=64, d=8, n=4)
    got = np.asarray(selective_scan(u, delta, A, B, C, D, bias, chunk=16))

    # torch stand-in consumes the reference's (B, K*D, L) flat layout
    b, k, L, d = u.shape
    tu = torch.from_numpy(u.transpose(0, 1, 3, 2).reshape(b, k * d, L))
    tdt = torch.from_numpy(delta.transpose(0, 1, 3, 2).reshape(b, k * d, L))
    tA = torch.from_numpy(A.reshape(k * d, -1))
    tB = torch.from_numpy(B.transpose(0, 1, 3, 2))  # (b, k, n, L)
    tC = torch.from_numpy(C.transpose(0, 1, 3, 2))
    tD = torch.from_numpy(D.reshape(-1))
    tbias = torch.from_numpy(bias.reshape(-1))
    want = (
        selective_scan_sequential_torch(
            tu, tdt, tA, tB, tC, tD, delta_bias=tbias, delta_softplus=True
        )
        .numpy()
        .reshape(b, k, d, L)
        .transpose(0, 1, 3, 2)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
