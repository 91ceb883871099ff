"""Inception-ResNet-v2 feature trunk (through mixed_7a) in Flax.

The reference builds this backbone via timm
(/root/reference/src/deblurganv2/models/fpn_inception.py:94) but loads ALL
weights from the released fpn_inception.h5 generator checkpoint, so no timm
dependency is needed — only an op-graph-faithful reimplementation of the
standard Inception-ResNet-v2 (Szegedy et al. 2016, the Cadene/timm port's
structure and naming) up to the stages the FPN taps:

  conv2d_1a .. maxpool_3a .. maxpool_5a .. mixed_5b .. repeat (10x Block35)
  .. mixed_6a .. repeat_1 (20x Block17) .. mixed_7a

BasicConv2d = conv(bias=False) + BatchNorm(eps=1e-3) + ReLU; all norms run
in train mode (per-sample statistics, see norms.py). NHWC throughout;
padding follows torch's symmetric integer padding (VALID where torch uses
padding=0).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .norms import TrainNorm


class BasicConv2d(nn.Module):
    out: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        else:
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.out, self.kernel, strides=self.stride, padding=pad,
            use_bias=False, name="conv",
        )(x)
        x = TrainNorm(self.out, affine=True, eps=1e-3, name="bn")(x)
        return nn.relu(x)


def _max_pool3(x, stride=2):
    return nn.max_pool(x, (3, 3), strides=(stride, stride), padding="VALID")


def _avg_pool3_exclusive(x):
    """AvgPool2d(3, stride=1, padding=1, count_include_pad=False)."""
    s = nn.avg_pool(
        x * 0 + 1.0, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
    )  # fraction of valid taps
    a = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    return a / s


class Mixed5b(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(96, (1, 1), name="branch0")(x)
        b1 = BasicConv2d(48, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(64, (5, 5), padding=2, name="branch1_1")(b1)
        b2 = BasicConv2d(64, (1, 1), name="branch2_0")(x)
        b2 = BasicConv2d(96, (3, 3), padding=1, name="branch2_1")(b2)
        b2 = BasicConv2d(96, (3, 3), padding=1, name="branch2_2")(b2)
        b3 = _avg_pool3_exclusive(x)
        b3 = BasicConv2d(64, (1, 1), name="branch3_1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Block35(nn.Module):
    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(32, (1, 1), name="branch0")(x)
        b1 = BasicConv2d(32, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(32, (3, 3), padding=1, name="branch1_1")(b1)
        b2 = BasicConv2d(32, (1, 1), name="branch2_0")(x)
        b2 = BasicConv2d(48, (3, 3), padding=1, name="branch2_1")(b2)
        b2 = BasicConv2d(64, (3, 3), padding=1, name="branch2_2")(b2)
        up = nn.Conv(320, (1, 1), name="conv2d")(jnp.concatenate([b0, b1, b2], axis=-1))
        return nn.relu(x + self.scale * up)


class Mixed6a(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(384, (3, 3), stride=2, name="branch0")(x)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(256, (3, 3), padding=1, name="branch1_1")(b1)
        b1 = BasicConv2d(384, (3, 3), stride=2, name="branch1_2")(b1)
        b2 = _max_pool3(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Block17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(192, (1, 1), name="branch0")(x)
        b1 = BasicConv2d(128, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(160, (1, 7), padding=(0, 3), name="branch1_1")(b1)
        b1 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch1_2")(b1)
        up = nn.Conv(1088, (1, 1), name="conv2d")(jnp.concatenate([b0, b1], axis=-1))
        return nn.relu(x + self.scale * up)


class Mixed7a(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(256, (1, 1), name="branch0_0")(x)
        b0 = BasicConv2d(384, (3, 3), stride=2, name="branch0_1")(b0)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0")(x)
        b1 = BasicConv2d(288, (3, 3), stride=2, name="branch1_1")(b1)
        b2 = BasicConv2d(256, (1, 1), name="branch2_0")(x)
        b2 = BasicConv2d(288, (3, 3), padding=1, name="branch2_1")(b2)
        b2 = BasicConv2d(320, (3, 3), stride=2, name="branch2_2")(b2)
        b3 = _max_pool3(x)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionTrunk(nn.Module):
    """Returns (enc0, enc1, enc2, enc3, enc4) as sliced by the reference FPN
    (fpn_inception.py:99-118)."""

    @nn.compact
    def __call__(self, x):
        enc0 = BasicConv2d(32, (3, 3), stride=2, name="conv2d_1a")(x)

        h = BasicConv2d(32, (3, 3), name="conv2d_2a")(enc0)
        h = BasicConv2d(64, (3, 3), padding=1, name="conv2d_2b")(h)
        enc1 = _max_pool3(h)

        h = BasicConv2d(80, (1, 1), name="conv2d_3b")(enc1)
        h = BasicConv2d(192, (3, 3), name="conv2d_4a")(h)
        enc2 = _max_pool3(h)

        h = Mixed5b(name="mixed_5b")(enc2)
        for i in range(10):
            h = Block35(name=f"repeat_{i}")(h)
        enc3 = Mixed6a(name="mixed_6a")(h)

        h = enc3
        for i in range(20):
            h = Block17(name=f"repeat_1_{i}")(h)
        enc4 = Mixed7a(name="mixed_7a")(h)

        return enc0, enc1, enc2, enc3, enc4


# ---------------------------------------------------------------------------
# Weight conversion helpers (timm/Cadene naming in the checkpoint)
# ---------------------------------------------------------------------------


def _f32(x):
    return np.asarray(x, np.float32)


def _conv_k(sd, name, bias=False):
    p = {"kernel": np.ascontiguousarray(_f32(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if bias:
        p["bias"] = _f32(sd[f"{name}.bias"])
    return p


def _basic(sd, name):
    return {
        "conv": _conv_k(sd, f"{name}.conv"),
        "bn": {"weight": _f32(sd[f"{name}.bn.weight"]), "bias": _f32(sd[f"{name}.bn.bias"])},
    }


def _branch_seq(sd, base, branch, n):
    """torch Sequential branchX -> flax branchX_0..branchX_{n-1}."""
    return {f"{branch}_{j}": _basic(sd, f"{base}.{branch}.{j}") for j in range(n)}


def convert_trunk(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Convert the inception trunk given torch key prefix (e.g. 'fpn.inception')."""
    p: Dict[str, Any] = {}
    for name in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b", "conv2d_4a"):
        p[name] = _basic(sd, f"{prefix}.{name}")

    m5 = {"branch0": _basic(sd, f"{prefix}.mixed_5b.branch0")}
    m5.update(_branch_seq(sd, f"{prefix}.mixed_5b", "branch1", 2))
    m5.update(_branch_seq(sd, f"{prefix}.mixed_5b", "branch2", 3))
    m5["branch3_1"] = _basic(sd, f"{prefix}.mixed_5b.branch3.1")
    p["mixed_5b"] = m5

    for i in range(10):
        b = f"{prefix}.repeat.{i}"
        blk = {"branch0": _basic(sd, f"{b}.branch0")}
        blk.update(_branch_seq(sd, b, "branch1", 2))
        blk.update(_branch_seq(sd, b, "branch2", 3))
        blk["conv2d"] = _conv_k(sd, f"{b}.conv2d", bias=True)
        p[f"repeat_{i}"] = blk

    m6 = {"branch0": _basic(sd, f"{prefix}.mixed_6a.branch0")}
    m6.update(_branch_seq(sd, f"{prefix}.mixed_6a", "branch1", 3))
    p["mixed_6a"] = m6

    for i in range(20):
        b = f"{prefix}.repeat_1.{i}"
        blk = {"branch0": _basic(sd, f"{b}.branch0")}
        blk.update(_branch_seq(sd, b, "branch1", 3))
        blk["conv2d"] = _conv_k(sd, f"{b}.conv2d", bias=True)
        p[f"repeat_1_{i}"] = blk

    m7 = {}
    m7.update(_branch_seq(sd, f"{prefix}.mixed_7a", "branch0", 2))
    m7.update(_branch_seq(sd, f"{prefix}.mixed_7a", "branch1", 2))
    m7.update(_branch_seq(sd, f"{prefix}.mixed_7a", "branch2", 3))
    p["mixed_7a"] = m7
    return p
