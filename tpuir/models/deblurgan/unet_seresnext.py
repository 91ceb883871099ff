"""UNet-SEResNeXt generator (DeblurGANv2, dead code in the reference's
tested path — ``g_name: unet_seresnext`` would in fact crash there:
get_generator passes a ``norm_layer`` kwarg the constructor doesn't accept,
networks.py:288-290).

TPU-native Flax port of /root/reference/src/deblurganv2/models/unet_seresnext.py
with the vendored SE-ResNeXt-50 32x4d encoder
(/root/reference/src/deblurganv2/models/senet.py:177-428 — the vendored
copy replaces every BatchNorm with InstanceNorm2d(affine=False), which we
reproduce with per-sample TrainNorm). NHWC; grouped 3x3 convs use
feature_group_count; the caffe-compat ceil-mode maxpool pads with -inf.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpuir.models.deblurgan.norms import TrainNorm


def _maxpool_ceil(x, k=3, s=2):
    """MaxPool2d(3, 2, ceil_mode=True): pad bottom/right with -inf so the
    last partial window survives (senet.py:271-273)."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - k) // s) + 1
    out_w = -(-(w - k) // s) + 1
    ph = max(0, (out_h - 1) * s + k - h)
    pw = max(0, (out_w - 1) * s + k - w)
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


class _SEModule(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.channels // self.reduction, (1, 1), name="fc1")(s))
        s = nn.sigmoid(nn.Conv(self.channels, (1, 1), name="fc2")(s))
        return x * s


class _SEResNeXtBottleneck(nn.Module):
    """senet.py:177-198: 1x1 -> grouped 3x3 (stride) -> 1x1, SE, residual."""

    planes: int
    groups: int = 32
    reduction: int = 16
    stride: int = 1
    base_width: int = 4
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        width = (self.planes * self.base_width // 64) * self.groups
        out = nn.Conv(width, (1, 1), name="conv1")(x)
        out = nn.relu(TrainNorm(width, name="bn1")(out))
        out = nn.Conv(
            width, (3, 3), strides=(self.stride,) * 2, padding=1,
            feature_group_count=self.groups, name="conv2",
        )(out)
        out = nn.relu(TrainNorm(width, name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), name="conv3")(out)
        out = TrainNorm(self.planes * 4, name="bn3")(out)
        residual = x
        if self.has_downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                name="downsample_0",
            )(x)
            residual = TrainNorm(self.planes * 4, name="downsample_1")(residual)
        out = _SEModule(self.planes * 4, self.reduction, name="se_module")(out)
        return nn.relu(out + residual)


class SEResNeXt50Trunk(nn.Module):
    """se_resnext50_32x4d features: returns (layer0..layer4) activations."""

    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, name="layer0_conv1")(x)
        h = nn.relu(TrainNorm(64, name="layer0_bn1")(h))
        l0 = _maxpool_ceil(h)

        h = l0
        inplanes = 64
        outs = []
        for li, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))
        ):
            for b in range(blocks):
                has_ds = b == 0 and (stride != 1 or inplanes != planes * 4)
                h = _SEResNeXtBottleneck(
                    planes, stride=stride if b == 0 else 1,
                    has_downsample=has_ds, name=f"layer{li + 1}_{b}",
                )(h)
                inplanes = planes * 4
            outs.append(h)
        l1, l2, l3, l4 = outs
        return l0, l1, l2, l3, l4


def _convT_k4s2(x, kernel_iokk, bias):
    """torch ConvTranspose2d(k4, s2, p1): dilate-by-2 correlation with the
    flipped kernel, symmetric padding 2."""
    k = jnp.flip(kernel_iokk, axis=(2, 3)).transpose(2, 3, 0, 1)  # HW I O
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


class _ConvRelu(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Conv(self.out, (3, 3), padding=1, name="conv")(x))


class _DecoderBlockV(nn.Module):
    """unet_seresnext.py:104-126 (is_deconv=True layout)."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        h = _ConvRelu(self.mid, name="cr")(x)
        kern = self.param(
            "deconv_kernel", nn.initializers.lecun_normal(),
            (self.mid, self.out, 4, 4),  # torch (in, out, kh, kw)
        )
        b = self.param("deconv_bias", nn.initializers.zeros, (self.out,))
        h = _convT_k4s2(h, kern, b)
        return nn.relu(TrainNorm(self.out, name="norm")(h))


def _bilinear_up(x, factor):
    """F.upsample(mode='bilinear', align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), "bilinear")


class UNetSEResNext(nn.Module):
    num_classes: int = 3
    num_filters: int = 32
    is_deconv: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.is_deconv:
            raise NotImplementedError("only the is_deconv=True layout is built")
        nf = self.num_filters
        l0, l1, l2, l3, l4 = SEResNeXt50Trunk(name="encoder")(x)

        # DecoderCenter is constructed with is_deconv=False
        # (unet_seresnext.py:50,146-151): two ConvRelus, no upsample
        center = _ConvRelu(nf * 16, name="center_cr0")(l4)
        center = _ConvRelu(nf * 8, name="center_cr1")(center)
        dec5 = _DecoderBlockV(nf * 16, nf * 2, name="dec5")(
            jnp.concatenate([center, l4], axis=-1)
        )
        dec4 = _DecoderBlockV(nf * 8, nf * 2, name="dec4")(
            jnp.concatenate([dec5, l3], axis=-1)
        )
        dec3 = _DecoderBlockV(nf * 4, nf * 2, name="dec3")(
            jnp.concatenate([dec4, l2], axis=-1)
        )
        dec2 = _DecoderBlockV(nf * 2, nf * 2, name="dec2")(
            jnp.concatenate([dec3, l1], axis=-1)
        )
        dec1 = _DecoderBlockV(nf, nf * 2, name="dec1")(dec2)
        f = jnp.concatenate(
            [
                dec1,
                _bilinear_up(dec2, 2),
                _bilinear_up(dec3, 4),
                _bilinear_up(dec4, 8),
                _bilinear_up(dec5, 16),
            ],
            axis=-1,
        )
        dec0 = _ConvRelu(nf * 2, name="dec0")(f)
        return nn.Conv(self.num_classes, (1, 1), name="final")(dec0)


# ---------------------------------------------------------------------------
# torch state_dict -> Flax params
# ---------------------------------------------------------------------------


def _c(sd, k):
    w = np.asarray(sd[f"{k}.weight"], np.float32)
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{k}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{k}.bias"], np.float32)
    return p


def _grouped_c(sd, k, groups):
    """torch grouped conv weight (O, I/g, kh, kw) -> flax HWIO with
    I = I/g (flax contracts per group with the same layout)."""
    return _c(sd, k)


def convert_state_dict(sd: Dict[str, np.ndarray], num_filters: int = 32,
                       layers: Sequence[int] = (3, 4, 6, 3)) -> Dict:
    # strip only a LEADING DataParallel prefix (``se_module.`` contains the
    # substring, so a blanket replace would corrupt the SE keys)
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    # the UNet aliases encoder.layerN as its convN+1 attribute; the
    # canonical ``encoder.*`` key set is the complete one
    enc: Dict[str, Any] = {"layer0_conv1": _c(sd, "encoder.layer0.conv1")}
    for li, blocks in enumerate(layers, start=1):
        pre = f"encoder.layer{li}"
        for b in range(blocks):
            bp: Dict[str, Any] = {
                "conv1": _c(sd, f"{pre}.{b}.conv1"),
                "conv2": _grouped_c(sd, f"{pre}.{b}.conv2", 32),
                "conv3": _c(sd, f"{pre}.{b}.conv3"),
                "se_module": {
                    "fc1": _c(sd, f"{pre}.{b}.se_module.fc1"),
                    "fc2": _c(sd, f"{pre}.{b}.se_module.fc2"),
                },
            }
            if f"{pre}.{b}.downsample.0.weight" in sd:
                bp["downsample_0"] = _c(sd, f"{pre}.{b}.downsample.0")
            enc[f"layer{li}_{b}"] = bp

    params: Dict[str, Any] = {"encoder": enc}

    def dec_block(prefix):
        return {
            "cr": {"conv": _c(sd, f"{prefix}.block.0.conv")},
            "deconv_kernel": np.asarray(sd[f"{prefix}.block.1.weight"], np.float32),
            "deconv_bias": np.asarray(sd[f"{prefix}.block.1.bias"], np.float32),
        }

    for name in ("dec5", "dec4", "dec3", "dec2", "dec1"):
        params[name] = dec_block(name)
    params["center_cr0"] = {"conv": _c(sd, "center.block.0.conv")}
    params["center_cr1"] = {"conv": _c(sd, "center.block.1.conv")}
    params["dec0"] = {"conv": _c(sd, "dec0.conv")}
    params["final"] = _c(sd, "final")
    return {"params": params}
