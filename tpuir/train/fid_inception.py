"""InceptionV3 FID feature extractor in Flax (NHWC, eval-mode BN).

Replaces the reference's FID pipeline
(/root/reference/src/mair/realDenoising/basicsr/metrics/fid.py:10-18, which
imports `basicsr.models.archs.inception.InceptionV3` — a module that does
not exist in the reference tree, so upstream FID extraction is actually
broken). This is the standard pytorch-fid trunk: torchvision Inception v3
up to the final average pool (2048-d), with the three FID deviations from
stock torchvision:

  * InceptionA / InceptionC / first InceptionE use
    AvgPool2d(count_include_pad=False) for their pool branch;
  * the second InceptionE (Mixed_7c) uses a 3x3/1 MAX pool branch;
  * no aux classifier, features taken after global average pooling.

Weights load from the released ``pt_inception-2015-12-05`` checkpoint via
``convert_fid_inception_state_dict`` (torch-free reader compatible); module
names mirror the torch names so the key mapping is 1:1.

Structure oracle-tested against a torch stand-in with shared random
weights in tests/test_fid_inception.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

FID_DIMS = 2048


class EvalBN(nn.Module):
    """BatchNorm in inference mode: running statistics are parameters."""

    features: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv + bias


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
        x = EvalBN(self.out, name="bn")(x)
        return nn.relu(x)


def _avg_pool3_exclusive(x):
    """AvgPool2d(3, stride=1, padding=1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    frac = nn.avg_pool(ones, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    a = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    return a / frac


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool3_exclusive(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool3_exclusive(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # Mixed_7b: FID exclusive-avg; Mixed_7c: max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1),
                            name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0),
                            name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool3_exclusive(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """2048-d pool3 features; input NHWC RGB in [0, 1]."""

    resize_input: bool = True
    normalize_input: bool = False

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)


# ---------------------------------------------------------------------------
# Weight ingestion + the reference fid.py API surface
# ---------------------------------------------------------------------------

_BN_MAP = {
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def convert_fid_inception_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torch (pytorch-fid / torchvision naming) state dict -> Flax params.

    Keys look like ``Mixed_5b.branch1x1.conv.weight`` /
    ``...bn.running_mean``; module names match 1:1, conv kernels transpose
    OIHW -> HWIO. Classifier (``fc.*``) and aux (``AuxLogits.*``) entries
    are ignored.
    """
    params: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        leaf = parts[-1]
        kind = parts[-2]  # 'conv' or 'bn'
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = np.asarray(val)
        if kind == "conv" and leaf == "weight":
            node["kernel"] = arr.transpose(2, 3, 1, 0)
        elif kind == "bn":
            if leaf == "num_batches_tracked":
                continue
            node[_BN_MAP[leaf]] = arr
        else:
            raise KeyError(f"unexpected checkpoint entry {key}")
    return {"params": params}


def load_patched_inception_v3(
    weights_path: str | None = None,
    resize_input: bool = True,
    normalize_input: bool = False,
):
    """(module, params) — fid.py:load_patched_inception_v3 equivalent.

    With ``weights_path`` pointing at a pt_inception checkpoint the params
    are converted from it; otherwise they are randomly initialized (useful
    for pipeline tests; FID numbers then carry no meaning).
    """
    module = InceptionV3FID(
        resize_input=resize_input, normalize_input=normalize_input
    )
    if weights_path is not None:
        from tpuir.weights.torch_pickle import load_torch_checkpoint

        params = convert_fid_inception_state_dict(
            load_torch_checkpoint(weights_path)
        )
    else:
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3), jnp.float32)
        )
    return module, params


def extract_inception_features(
    data_generator, module, params, batch_size: int = 64
) -> np.ndarray:
    """Concatenate pool3 features over a generator of NHWC [0,1] arrays
    (fid.py:extract_inception_features equivalent; jit-compiled per shape)."""
    fwd = jax.jit(module.apply)
    feats = []
    for batch in data_generator:
        arr = jnp.asarray(batch, jnp.float32)
        if arr.ndim == 3:
            arr = arr[None]
        feats.append(np.asarray(fwd(params, arr)))
    return np.concatenate(feats, axis=0)
