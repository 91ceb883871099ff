"""Sharded patch-grid inference on the virtual 8-device mesh."""

import numpy as np
import jax
import pytest

from tpuir.core.engine import InferenceModel, run_model_inference
from tpuir.parallel.mesh import make_mesh
from tpuir.parallel.inference import run_model_inference_sharded


def test_sharded_matches_single_device():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides an 8-device CPU mesh"
    mesh = make_mesh({"dp": 8})

    model = InferenceModel(
        name="blur",
        apply_fn=lambda p, x: (x + jnp_roll(x)) / 2,
        params=(),
        patch_size=48,
        patch_overlap=16,
        pad_factor=8,
    )
    img = (np.random.RandomState(0).rand(100, 120, 3) * 255).astype(np.uint8)
    want, _ = run_model_inference(model, img, need_degradation=True, noise_level=25)
    got, _ = run_model_inference_sharded(
        model, img, mesh, need_degradation=True, noise_level=25
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1  # device-pipeline noise add differs by <=1 ulp


def jnp_roll(x):
    import jax.numpy as jnp

    return jnp.roll(x, 1, axis=1)


def test_sharded_real_architecture_matches_host():
    """Sharded tiled inference of a real model (tiny Restormer), not a toy
    lambda: the patch grid shards over dp and must reproduce the host path."""
    from tpuir.models.restormer import Restormer

    mesh = make_mesh({"dp": 8})
    net = Restormer(dim=16, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1)
    import jax.numpy as jnp

    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    model = InferenceModel(
        name="restormer-tiny", apply_fn=net.apply, params=params,
        patch_size=32, patch_overlap=8, pad_factor=8,
    )
    img = (np.random.RandomState(2).rand(48, 64, 3) * 255).astype(np.uint8)
    want, _ = run_model_inference(model, img)
    got, _ = run_model_inference_sharded(model, img, mesh)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1


def test_pallas_scan_under_shard_map():
    """The Pallas selective scan runs under shard_map (interpret mode) with
    the batch sharded over dp, matching the unsharded result."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tpuir.ops.scan_pallas import selective_scan_fused_proj

    rng = np.random.RandomState(7)
    b, k, L, d, n, r = 8, 4, 64, 16, 4, 2
    xs = rng.randn(b, k, L, d).astype(np.float32)
    wxp = (rng.randn(k, r + 2 * n, d) * 0.2).astype(np.float32)
    wdt = (rng.randn(k, d, r) * 0.2).astype(np.float32)
    A = -np.exp(rng.randn(k, d, n).astype(np.float32) * 0.3)
    D = rng.randn(k, d).astype(np.float32)
    bias = (rng.randn(k, d) * 0.2).astype(np.float32)

    want = np.asarray(
        selective_scan_fused_proj(xs, wxp, wdt, A, D, bias, chunk=16,
                                  interpret=True)
    )

    mesh = make_mesh({"dp": 8})
    sharded = jax.shard_map(
        lambda x, w1, w2, a, dd, bb: selective_scan_fused_proj(
            x, w1, w2, a, dd, bb, chunk=16, interpret=True
        ),
        mesh=mesh,
        in_specs=(P("dp"), P(), P(), P(), P(), P()),
        out_specs=P("dp"),
        check_vma=False,  # pallas_call's ShapeDtypeStruct carries no vma info
    )
    got = np.asarray(
        sharded(jnp.asarray(xs), jnp.asarray(wxp), jnp.asarray(wdt),
                jnp.asarray(A), jnp.asarray(D), jnp.asarray(bias))
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_uses_all_devices():
    mesh = make_mesh({"dp": 8})
    seen = []

    def apply_fn(params, x):
        seen.append(x.shape)
        return x

    model = InferenceModel(
        name="id", apply_fn=apply_fn, params=(), patch_size=32, patch_overlap=8
    )
    img = (np.random.RandomState(1).rand(96, 96, 1) * 255).astype(np.uint8)
    out, _ = run_model_inference_sharded(model, img, mesh)
    np.testing.assert_array_equal(out, img)


def test_sharded_phase_io_matches_single_device():
    """The pack4 phase-IO serving path shards over dp like any other
    patch grid (native phase gather -> sharded forward -> phase blend)."""
    import jax.numpy as jnp

    from tpuir.core.image_io import normalize_signed
    from tpuir.models.deblurgan.fpn_mobilenet import FPNMobileNet

    mesh = make_mesh({"dp": 8})
    plain = FPNMobileNet()
    net = FPNMobileNet(phase_io=True)
    params = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    common = dict(
        params=params, patch_size=None, patch_overlap=0, pad_block=32,
        normalize=normalize_signed, postprocess=lambda x: (x + 1) / 2.0,
    )
    phase = InferenceModel(name="g", apply_fn=net.apply, phase_io=True, **common)
    img = (np.random.RandomState(3).rand(45, 53, 3) * 255).astype(np.uint8)
    want, _ = run_model_inference(phase, img)
    got, _ = run_model_inference_sharded(phase, img, mesh)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
