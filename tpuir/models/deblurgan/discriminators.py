"""DeblurGANv2 discriminators (training side).

TPU-native Flax re-design of the reference discriminators
(/root/reference/src/deblurganv2/models/networks.py:133-262) and the
factory semantics of ``get_discriminator``/``get_fullD``
(networks.py:265-311). NHWC layout; 4x4 convs carry the reference's
asymmetry-free explicit padding of 2 (torch ``padding=ceil(3/2)``), so
spatial sizes match torch exactly (floor(H/s) + 1 per strided stage).

Norms follow the reference's ``get_norm_layer`` (networks.py:18-25):
'instance' = InstanceNorm2d(affine=False) — per-sample statistics, the
same math in train and eval; 'batch' = BatchNorm2d(affine=True) run in
train mode (current batch statistics) since discriminators only exist
during training. Conv bias is enabled exactly when the norm is instance
(networks.py:138-141,224-227).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tpuir.models.deblurgan.norms import TrainNorm


class _BatchNormTrain(nn.Module):
    """Affine BatchNorm in train mode: current-batch statistics over
    (N, H, W). Discriminators never run in eval, so no running stats."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=(0, 1, 2), keepdims=True)
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = (x32 - mu) / jnp.sqrt(var + self.eps) * weight + bias
        return y.astype(x.dtype)


def _norm(kind: str, features: int, name: str):
    if kind == "instance":
        return TrainNorm(features, affine=False, name=name)
    if kind == "batch":
        return _BatchNormTrain(features, name=name)
    raise NotImplementedError(f"normalization layer [{kind}] is not found")


def _conv(feats: int, stride: int, bias: bool, name: str):
    return nn.Conv(
        feats, (4, 4), strides=(stride, stride), padding=((2, 2), (2, 2)),
        use_bias=bias, name=name,
    )


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class NLayerDiscriminator(nn.Module):
    """PatchGAN (networks.py:220-262): n_layers strided 4x4 stages, one
    stride-1 stage, 1-channel head. Param names index the torch
    ``model.N`` Sequential slots so checkpoints convert 1:1."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        bias = self.norm == "instance"
        i = 0
        x = _lrelu(_conv(self.ndf, 2, True, f"model_{i}")(x))
        i += 2
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            x = _conv(self.ndf * nf_mult, 2, bias, f"model_{i}")(x)
            x = _lrelu(_norm(self.norm, self.ndf * nf_mult, f"model_{i + 1}")(x))
            i += 3
        nf_mult = min(2**self.n_layers, 8)
        x = _conv(self.ndf * nf_mult, 1, bias, f"model_{i}")(x)
        x = _lrelu(_norm(self.norm, self.ndf * nf_mult, f"model_{i + 1}")(x))
        i += 3
        x = _conv(1, 1, True, f"model_{i}")(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x


class _Tail(nn.Module):
    """DicsriminatorTail (networks.py:133-160) [sic — reference spelling]:
    two stride-1 4x4 convs with one norm, to a 1-channel map. The reference
    never forwards the trunk's norm_layer here, so tails ALWAYS run the
    default affine BatchNorm2d with bias-free first conv
    (networks.py:137-141,200-206)."""

    nf_mult_in: int
    n_layers: int
    ndf: int = 64

    @nn.compact
    def __call__(self, x):
        nf_mult = min(2**self.n_layers, 8)
        x = _conv(self.ndf * nf_mult, 1, False, "model_0")(x)
        x = _lrelu(_norm("batch", self.ndf * nf_mult, "model_1")(x))
        return _conv(1, 1, True, "model_3")(x)


class MultiScaleDiscriminator(nn.Module):
    """networks.py:162-217: one strided trunk with three tap-off tails at
    increasing receptive fields; returns [x_1, x_2, x_3]."""

    input_nc: int = 3
    ndf: int = 64
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        bias = self.norm == "instance"
        x = _lrelu(_conv(self.ndf, 2, True, "scale_one_0")(x))
        nf_mult = 1
        i = 2
        for n in range(1, 3):
            nf_mult = min(2**n, 8)
            x = _conv(self.ndf * nf_mult, 2, bias, f"scale_one_{i}")(x)
            x = _lrelu(_norm(self.norm, self.ndf * nf_mult, f"scale_one_{i + 1}")(x))
            i += 3
        x_1 = _Tail(nf_mult, 3, self.ndf, name="first_tail")(x)

        x = _conv(self.ndf * 8, 2, bias, "scale_two_0")(x)
        x = _lrelu(_norm(self.norm, self.ndf * 8, "scale_two_1")(x))
        x_2 = _Tail(8, 4, self.ndf, name="second_tail")(x)

        x = _conv(self.ndf * 8, 2, bias, "scale_three_0")(x)
        x = _lrelu(_norm(self.norm, self.ndf * 8, "scale_three_1")(x))
        x_3 = _Tail(8, 5, self.ndf, name="third_tail")(x)
        return [x_1, x_2, x_3]


def get_discriminator(model_config: Dict[str, Any]):
    """(networks.py:296-311): returns {'patch': module} / {'patch', 'full'}
    / {'multi_scale': module} / {} for no_gan."""
    name = model_config["d_name"]
    norm = model_config.get("norm_layer", "instance")
    if name == "no_gan":
        return {}
    if name == "patch_gan":
        return {
            "patch": NLayerDiscriminator(
                n_layers=model_config["d_layers"], norm=norm, use_sigmoid=False
            )
        }
    if name == "double_gan":
        return {
            "patch": NLayerDiscriminator(
                n_layers=model_config["d_layers"], norm=norm, use_sigmoid=False
            ),
            "full": NLayerDiscriminator(n_layers=5, norm=norm, use_sigmoid=False),
        }
    if name == "multi_scale":
        return {"multi_scale": MultiScaleDiscriminator(norm=norm)}
    raise ValueError(f"Discriminator Network [{name}] not recognized.")


# ---------------------------------------------------------------------------
# torch state_dict -> Flax params
# ---------------------------------------------------------------------------


def _c(sd, k):
    w = np.asarray(sd[f"{k}.weight"], np.float32)
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{k}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{k}.bias"], np.float32)
    return p


def _n(sd, k):
    if f"{k}.weight" in sd:  # affine batch norm
        return {
            "weight": np.asarray(sd[f"{k}.weight"], np.float32),
            "bias": np.asarray(sd[f"{k}.bias"], np.float32),
        }
    return {}


def convert_nlayer(sd: Dict[str, np.ndarray], n_layers: int = 3,
                   norm: str = "instance") -> Dict:
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params: Dict[str, Any] = {"model_0": _c(sd, "model.0")}
    i = 2
    for _ in range(1, n_layers):
        params[f"model_{i}"] = _c(sd, f"model.{i}")
        nrm = _n(sd, f"model.{i + 1}")
        if nrm:
            params[f"model_{i + 1}"] = nrm
        i += 3
    params[f"model_{i}"] = _c(sd, f"model.{i}")
    nrm = _n(sd, f"model.{i + 1}")
    if nrm:
        params[f"model_{i + 1}"] = nrm
    i += 3
    params[f"model_{i}"] = _c(sd, f"model.{i}")
    return {"params": params}


def convert_multiscale(sd: Dict[str, np.ndarray], norm: str = "instance") -> Dict:
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    for scale, idxs in (
        ("scale_one", (0, 2, 5)),
        ("scale_two", (0,)),
        ("scale_three", (0,)),
    ):
        for i in idxs:
            params[f"{scale}_{i}"] = _c(sd, f"{scale}.{i}")
            nrm = _n(sd, f"{scale}.{i + 1}")
            if nrm:
                params[f"{scale}_{i + 1}"] = nrm
    for tail in ("first_tail", "second_tail", "third_tail"):
        tp: Dict[str, Any] = {"model_0": _c(sd, f"{tail}.model.0")}
        nrm = _n(sd, f"{tail}.model.1")
        if nrm:
            tp["model_1"] = nrm
        tp["model_3"] = _c(sd, f"{tail}.model.3")
        params[tail] = tp
    return {"params": params}
