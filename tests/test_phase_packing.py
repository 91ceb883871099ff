"""Phase-packing correctness: numeric kernel derivation, the phase-IO
engine path, and the native phase gather/blend.

The packing design (fold.py): TPU NHWC convs with C << 128 run at
lane-tile fill, so serving re-expresses them as convs on space_to_depth
block grids with kernels derived NUMERICALLY from the original params
(derive_packed_kernel — exact by construction). These tests pin
exactness on CPU; benchmarks/explore_packed_conv.py measures the wins.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from tpuir.models.deblurgan import fold as F


def conv(x, k, stride=1, pad="same"):
    p = ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2) if pad == "same" else pad
    return lax.conv_general_dilated(
        x, k, (stride, stride), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_derive_packed_kernel_tail_pack4():
    """up2 + conv3x3 (32->3) == conv (3,3,128,48) on the 2-folded grid."""
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 32, 3).astype(np.float32) * 0.2)

    def up2_conv(s):
        up = jnp.repeat(jnp.repeat(s, 2, axis=1), 2, axis=2)
        return conv(up, k)

    def packed_map(xp):
        return F.space_to_depth(up2_conv(F.depth_to_space(xp, 2, 32)), 4)

    pk = F.derive_packed_kernel(packed_map, 128, 3)
    assert pk.shape == (3, 3, 128, 48)
    s = jnp.asarray(rng.rand(1, 16, 16, 32).astype(np.float32))
    want = up2_conv(s)
    got = F.depth_to_space(conv(F.space_to_depth(s, 2), pk), 4, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_derive_packed_kernel_entry():
    """stride-2 conv3x3 (3->32) == conv (3,3,48,128) on 4-folded input."""
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(3, 3, 3, 32).astype(np.float32) * 0.2)

    def packed_map(xp):
        return F.space_to_depth(
            conv(F.depth_to_space(xp, 4, 3), k, stride=2), 2)

    pk = F.derive_packed_kernel(packed_map, 48, 3)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    want = conv(x, k, stride=2)
    got = F.depth_to_space(conv(F.space_to_depth(x, 4), pk), 2, 32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_derive_packed_kernel_depthwise():
    rng = np.random.RandomState(2)
    kd = jnp.asarray(rng.randn(3, 3, 1, 32).astype(np.float32) * 0.2)

    def dw(a):
        return lax.conv_general_dilated(
            a, kd, (1, 1), ((1, 1), (1, 1)), feature_group_count=32,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def packed_map(xp):
        return F.space_to_depth(dw(F.depth_to_space(xp, 2, 32)), 2)

    pk = F.derive_packed_kernel(packed_map, 128, 3)
    x = jnp.asarray(rng.rand(1, 16, 16, 32).astype(np.float32))
    want = dw(x)
    got = F.depth_to_space(conv(F.space_to_depth(x, 2), pk), 2, 32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fold_s2_entry_kernel_same_and_valid():
    rng = np.random.RandomState(3)
    k = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32) * 0.2)
    x = jnp.asarray(rng.rand(1, 24, 24, 3).astype(np.float32))
    x2 = F.space_to_depth2(x)
    # same
    want = conv(x, k, stride=2)
    pk = F.fold_s2_entry_kernel(k, "same")
    got = lax.conv_general_dilated(
        x2, pk, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # valid
    want = lax.conv_general_dilated(
        x, k, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    pk = F.fold_s2_entry_kernel(k, "valid")
    got = lax.conv_general_dilated(
        x2, pk, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fpn_mobilenet_phase_io_matches_normal():
    """The full pack4 serving path (packed entry/f1/f2/lateral0/smooth2/
    tail) equals the plain forward on shared params."""
    from tpuir.models.deblurgan.fpn_mobilenet import FPNMobileNet

    m = FPNMobileNet()
    mp = FPNMobileNet(phase_io=True)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 96, 96, 3).astype(np.float32) * 2 - 1)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3), jnp.float32))
    with jax.default_matmul_precision("float32"):
        want = m.apply(p, x)
        got16 = mp.apply(p, F.space_to_depth(x, 4))
    assert got16.shape == (1, 24, 24, 48)
    got = F.depth_to_space(got16, 4, 3)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_fpn_inception_packed_tail_matches_normal():
    from tpuir.models.deblurgan import FPNInception

    m = FPNInception()
    mp = FPNInception(packed_tail=True)
    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 160, 160, 3).astype(np.float32) * 2 - 1)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3), jnp.float32))
    with jax.default_matmul_precision("float32"):
        want = m.apply(p, x)
        got = mp.apply(p, x)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_phase_gather_blend_roundtrip():
    from tpuir import native
    from tpuir.core.tiling import gaussian_window

    rng = np.random.RandomState(4)
    img = rng.rand(45, 53, 3).astype(np.float32)
    coords = [(0, 0), (13, 21)]
    ph, pw = 32, 32
    ph_pad, pw_pad = 64, 64
    for f in (2, 4):
        got = native.extract_patches_phase(img, coords, ph, pw, ph_pad, pw_pad, f)
        # reference: plain gather + zero pad + numpy s2d
        plain = native.extract_patches(img, coords, ph, pw)
        full = np.zeros((2, ph_pad, pw_pad, 3), np.float32)
        full[:, :ph, :pw] = plain
        want = native._np_s2d(full, f)
        np.testing.assert_array_equal(got, want)

        # blend: phase preds == d2s'd preds through the plain blend
        preds4 = rng.rand(2, ph_pad // f, pw_pad // f, f * f * 3).astype(np.float32)
        win = gaussian_window(ph, pw, 3)
        got_b = native.blend_stitch_phase(preds4, coords, win, 45, 53, ph, pw, f)
        full_preds = native._np_d2s(preds4, 3, f)[:, :ph, :pw]
        want_b = native.blend_stitch(full_preds, coords, win, 45, 53)
        np.testing.assert_allclose(got_b, want_b, atol=1e-6)


def test_engine_phase_io_path_matches_plain():
    """Whole-engine parity: phase_io bundle vs plain bundle, odd image."""
    from tpuir.core.engine import InferenceModel, run_model_inference
    from tpuir.core.image_io import normalize_signed
    from tpuir.models.deblurgan.fpn_mobilenet import FPNMobileNet

    m = FPNMobileNet()
    mp = FPNMobileNet(phase_io=True)
    p = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32))
    img = (np.random.RandomState(5).rand(45, 53, 3) * 255).astype(np.uint8)
    common = dict(patch_size=None, patch_overlap=0, pad_block=32,
                  normalize=normalize_signed,
                  postprocess=lambda x: (x + 1) / 2.0)
    plain = InferenceModel(name="g", apply_fn=m.apply, params=p, **common)
    phase = InferenceModel(name="g", apply_fn=mp.apply, params=p,
                           phase_io=True, **common)
    out_plain, _ = run_model_inference(plain, img)
    out_phase, _ = run_model_inference(phase, img)
    d = np.abs(out_plain.astype(int) - out_phase.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-2, (d.max(), (d > 0).mean())
