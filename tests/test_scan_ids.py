"""NSS scan ids vs the reference torch implementation (used as oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tpuir.ops.scan_ids import mair_scan_ids


def _load_ref_module():
    # Load the file directly: the mair package __init__ pulls in deps
    # (torchvision etc.) that aren't installed here.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_shift_scanf_util",
        "/root/reference/src/mair/basicsr/archs/shift_scanf_util.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _reference_ids(H, W, scan_len, shift_len):
    ref = _load_ref_module()

    if shift_len:
        scan, inv = ref.mair_shift_ids_generate(
            inp_shape=(1, 1, H, W), scan_len=scan_len, shift_len=shift_len
        )
    else:
        scan, inv = ref.mair_ids_generate(inp_shape=(1, 1, H, W), scan_len=scan_len)
    return scan.numpy().reshape(4, -1), inv.numpy().reshape(4, -1)


@pytest.mark.parametrize(
    "H,W,scan_len,shift",
    [
        (8, 8, 4, 0),
        (8, 8, 4, 2),
        (16, 12, 4, 0),
        (16, 12, 4, 2),
        (10, 14, 4, 0),  # W not divisible by scan_len
        (10, 14, 4, 2),
        (9, 7, 4, 0),  # odd both
        (9, 7, 4, 2),
        (12, 12, 8, 4),
        (6, 21, 4, 2),
        (64, 64, 4, 0),
        (64, 64, 4, 2),
    ],
)
def test_scan_ids_match_reference(H, W, scan_len, shift):
    got_scan, got_inv = mair_scan_ids(H, W, scan_len, shift)
    want_scan, want_inv = _reference_ids(H, W, scan_len, shift)
    np.testing.assert_array_equal(got_scan, want_scan)
    np.testing.assert_array_equal(got_inv, want_inv)


def test_scan_inverse_roundtrip():
    scan, inv = mair_scan_ids(13, 17, 4, 2)
    L = 13 * 17
    for k in range(4):
        x = np.random.RandomState(k).rand(L)
        np.testing.assert_array_equal(x[scan[k]][inv[k]], x)
