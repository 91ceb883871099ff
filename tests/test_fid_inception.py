"""FID InceptionV3 extractor vs a random-weight torch oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.fid_inception_torch import FIDInceptionV3
from tpuir.train.fid_inception import (
    FID_DIMS,
    convert_fid_inception_state_dict,
    extract_inception_features,
    load_patched_inception_v3,
)


def _randomized_oracle(seed=0):
    torch.manual_seed(seed)
    net = FIDInceptionV3().eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return net


def test_matches_torch_oracle():
    net = _randomized_oracle()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    module, _ = load_patched_inception_v3(resize_input=False)
    params = convert_fid_inception_state_dict(sd)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 75, 75, 3).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(module.apply(params, x))
    assert got.shape == (2, FID_DIMS)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_extract_and_fid_pipeline():
    """extract_inception_features -> feature_stats -> calculate_fid: zero
    distance against itself, positive against a shifted set."""
    from tpuir.train.extra_metrics import calculate_fid_from_stats, feature_stats

    module, params = load_patched_inception_v3(resize_input=False)
    rng = np.random.RandomState(1)
    batches = [rng.rand(3, 75, 75, 3).astype(np.float32) for _ in range(2)]
    feats = extract_inception_features(iter(batches), module, params)
    assert feats.shape == (6, FID_DIMS)

    # Rank-deficient covariances (6 samples, 2048 dims) still yield a
    # finite distance thanks to the eps regularization path.
    mu1, s1 = feature_stats(feats)
    fid_same = calculate_fid_from_stats(mu1, s1, mu1, s1)
    assert abs(fid_same) < 1e-3

    feats2 = extract_inception_features(
        iter([b * 0.5 + 0.25 for b in batches]), module, params
    )
    mu2, s2 = feature_stats(feats2)
    assert calculate_fid_from_stats(mu1, s1, mu2, s2) > fid_same
