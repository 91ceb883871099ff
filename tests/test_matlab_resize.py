"""MATLAB-faithful imresize vs the reference implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import oracle
from tpuir.utils.matlab_resize import imresize


@pytest.mark.parametrize(
    "shape,scale", [((37, 53, 3), 0.5), ((64, 64), 0.5), ((24, 31, 3), 2.0),
                    ((40, 40, 1), 0.75)],
)
def test_imresize_matches_reference(shape, scale):
    mf = oracle._load_by_path(
        "ref_matlab_functions",
        "/root/reference/src/mair/basicsr/utils/matlab_functions.py",
    )
    rng = np.random.RandomState(0)
    img = rng.rand(*shape).astype(np.float64)
    want = mf.imresize(img if img.ndim == 3 else img[:, :, None], scale, True)
    if isinstance(want, torch.Tensor):
        want = want.numpy()
    got = imresize(img, scale, True)
    got3 = got if got.ndim == 3 else got[:, :, None]
    want3 = want if want.ndim == 3 else want[:, :, None]
    np.testing.assert_allclose(got3, want3, atol=1e-5, rtol=1e-5)
