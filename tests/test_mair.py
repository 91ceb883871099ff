"""Parity: MaIR (flat) Flax model vs the PyTorch reference with the
sequential-scan stand-in replacing the CUDA kernel."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tpuir.models import mair as jmair


def test_ssmixer_parity():
    """One VMM layer, random weights, against the reference module."""
    arch = oracle.load_reference_mair_arch()
    oracle.seed_torch(0)
    d_model, d_state, ratio, H, W, scan_len = 32, 4, 1.5, 12, 16, 4
    vmm = arch.VMM(d_model=d_model, d_state=d_state, expand=ratio).eval()
    sd = oracle.state_dict_numpy(vmm)
    d_inner = int(ratio * d_model)

    from tpuir.ops.scan_ids import mair_scan_ids

    scan, inv = mair_scan_ids(H, W, scan_len, 0)
    import torch as t

    ids_t = (
        t.from_numpy(scan.astype(np.int64)).reshape(4, 1, -1),
        t.from_numpy(inv.astype(np.int64)).reshape(4, 1, -1),
    )

    x = np.random.RandomState(1).rand(2, H, W, d_model).astype(np.float32)
    with t.no_grad():
        want = vmm(t.from_numpy(x), ids_t).numpy()

    mixer = jmair.SSMixer(d_model, d_state, ratio, scan_chunk=16)
    params = {
        "params": jmair.convert_ssmixer(
            {f"x.{k}": v for k, v in sd.items()}, "x", d_inner
        )
    }
    import jax.numpy as jnp

    got = np.asarray(
        mixer.apply(params, x, (jnp.asarray(scan), jnp.asarray(inv)))
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_mair_full_parity():
    """Small full MaIR vs reference (denoising branch, upsampler=None)."""
    arch = oracle.load_reference_mair_arch()
    oracle.seed_torch(0)
    kw = dict(
        img_size=16,
        in_chans=3,
        embed_dim=32,
        depths=(2, 2),
        d_state=4,
        ssm_ratio=1.5,
        mlp_ratio=2.0,
        scan_len=4,
        img_range=1.0,
        upsampler=None,
        resi_connection="1conv",
        dynamic_ids=False,
        drop_path_rate=0.0,
    )
    ref = arch.MaIR(**kw).eval()
    sd = oracle.state_dict_numpy(ref)

    model = jmair.MaIR(
        in_chans=3,
        embed_dim=32,
        depths=(2, 2),
        d_state=4,
        ssm_ratio=1.5,
        mlp_ratio=2.0,
        scan_len=4,
        scan_chunk=64,
    )
    params = jmair.convert_state_dict(sd, depths=(2, 2), embed_dim=32, ssm_ratio=1.5)

    x = np.random.RandomState(2).rand(1, 16, 16, 3).astype(np.float32)
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_mair_nonsquare_input():
    """Ids regenerate for non-training shapes (reference: mair_arch.py:688-698)."""
    arch = oracle.load_reference_mair_arch()
    oracle.seed_torch(1)
    kw = dict(
        img_size=16, in_chans=3, embed_dim=32, depths=(2,), d_state=4,
        ssm_ratio=1.5, mlp_ratio=2.0, scan_len=4, img_range=1.0,
        upsampler=None, resi_connection="1conv", dynamic_ids=False,
        drop_path_rate=0.0,
    )
    ref = arch.MaIR(**kw).eval()
    sd = oracle.state_dict_numpy(ref)
    model = jmair.MaIR(
        in_chans=3, embed_dim=32, depths=(2,), d_state=4, ssm_ratio=1.5,
        mlp_ratio=2.0, scan_len=4, scan_chunk=64,
    )
    params = jmair.convert_state_dict(sd, depths=(2,), embed_dim=32, ssm_ratio=1.5)
    x = np.random.RandomState(3).rand(1, 24, 16, 3).astype(np.float32)
    got = np.asarray(model.apply(params, x))
    want = oracle.torch_forward(ref, x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
