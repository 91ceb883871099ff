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
