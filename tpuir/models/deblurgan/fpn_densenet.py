"""FPN-DenseNet generator (DeblurGANv2, dead code in the reference's tested
path — ``g_name: fpn_dense``).

TPU-native Flax port of /root/reference/src/deblurganv2/models/fpn_densenet.py
including a DenseNet-121 feature trunk (the reference takes torchvision's
``densenet121().features``; the published layout is conv0/norm0/relu0/pool0,
dense blocks of (6, 12, 24, 16) layers with growth 32 and bn_size 4,
transitions halving channels and pooling, and a final norm5). BatchNorms run
in train mode (batch statistics) like every served DeblurGAN generator.
NHWC; output is plain tanh (no residual, fpn_densenet.py:65)."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tpuir.models.deblurgan.discriminators import _BatchNormTrain
from tpuir.models.deblurgan.norms import upsample_nearest


class _DenseLayer(nn.Module):
    growth: int = 32
    bn_size: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.relu(_BatchNormTrain(c, name="norm1")(x))
        h = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False,
                    name="conv1")(h)
        h = nn.relu(_BatchNormTrain(self.bn_size * self.growth, name="norm2")(h))
        h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class _Transition(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_BatchNormTrain(x.shape[-1], name="norm")(x))
        h = nn.Conv(self.out, (1, 1), use_bias=False, name="conv")(h)
        return nn.avg_pool(h, (2, 2), strides=(2, 2))


class DenseNet121Trunk(nn.Module):
    """Returns (enc0, enc1, enc2, enc3, enc4_normed) as the FPN taps them
    (fpn_densenet.py:84-122): enc0 pre-pool, encN = denseblockN output,
    enc4 after norm5."""

    block_config: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv0")(x)
        enc0 = nn.relu(_BatchNormTrain(64, name="norm0")(h))
        # torchvision pool0: MaxPool2d(3, 2, padding=1)
        h = nn.max_pool(
            jnp.pad(enc0, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf),
            (3, 3), strides=(2, 2),
        )
        feats = 64
        encs = []
        for bi, n_layers in enumerate(self.block_config, start=1):
            for li in range(n_layers):
                h = _DenseLayer(self.growth, name=f"denseblock{bi}_{li + 1}")(h)
            feats += n_layers * self.growth
            encs.append(h)
            if bi != len(self.block_config):
                feats //= 2
                h = _Transition(feats, name=f"transition{bi}")(h)
        enc1, enc2, enc3, enc4 = encs
        enc4 = _BatchNormTrain(feats, name="norm5")(enc4)  # no relu (FPN tap)
        return enc0, enc1, enc2, enc3, enc4


class _FPNSegHead(nn.Module):
    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.mid, (3, 3), padding=1, use_bias=False,
                            name="block0")(x))
        return nn.relu(nn.Conv(self.out, (3, 3), padding=1, use_bias=False,
                               name="block1")(x))


class _ConvBNRelu(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, (3, 3), padding=1, name="conv")(x)
        return nn.relu(_BatchNormTrain(self.out, name="norm")(x))


class FPNDense(nn.Module):
    output_ch: int = 3
    num_filters: int = 128
    num_filters_fpn: int = 256

    @nn.compact
    def __call__(self, x):
        nf, nfp = self.num_filters, self.num_filters_fpn
        enc0, enc1, enc2, enc3, enc4 = DenseNet121Trunk(name="features")(x)

        lateral4 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral4")(enc4)
        lateral3 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral3")(enc3)
        lateral2 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral2")(enc2)
        lateral1 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral1")(enc1)
        lateral0 = nn.Conv(nfp // 2, (1, 1), use_bias=False, name="lateral0")(enc0)

        map4 = lateral4
        map3 = lateral3 + upsample_nearest(map4, 2)
        map2 = lateral2 + upsample_nearest(map3, 2)
        map1 = lateral1 + upsample_nearest(map2, 2)

        map4 = upsample_nearest(_FPNSegHead(nf, nf, name="head4")(map4), 8)
        map3 = upsample_nearest(_FPNSegHead(nf, nf, name="head3")(map3), 4)
        map2 = upsample_nearest(_FPNSegHead(nf, nf, name="head2")(map2), 2)
        map1 = _FPNSegHead(nf, nf, name="head1")(map1)

        smoothed = _ConvBNRelu(nf, name="smooth")(
            jnp.concatenate([map4, map3, map2, map1], axis=-1)
        )
        smoothed = upsample_nearest(smoothed, 2)
        smoothed = _ConvBNRelu(nf // 2, name="smooth2")(smoothed + lateral0)
        smoothed = upsample_nearest(smoothed, 2)
        final = nn.Conv(self.output_ch, (3, 3), padding=1, name="final")(smoothed)
        return jnp.tanh(final)


# ---------------------------------------------------------------------------
# torch state_dict -> Flax params
# ---------------------------------------------------------------------------


def _c(sd, k, bias=False):
    w = np.asarray(sd[f"{k}.weight"], np.float32)
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if bias and f"{k}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{k}.bias"], np.float32)
    return p


def _bn(sd, k):
    return {
        "weight": np.asarray(sd[f"{k}.weight"], np.float32),
        "bias": np.asarray(sd[f"{k}.bias"], np.float32),
    }


def convert_state_dict(
    sd: Dict[str, np.ndarray], block_config: Sequence[int] = (6, 12, 24, 16)
) -> Dict:
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    tr: Dict[str, Any] = {
        "conv0": _c(sd, "fpn.features.conv0"),
        "norm0": _bn(sd, "fpn.features.norm0"),
        "norm5": _bn(sd, "fpn.features.norm5"),
    }
    for bi, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            base = f"fpn.features.denseblock{bi}.denselayer{li}"
            tr[f"denseblock{bi}_{li}"] = {
                "norm1": _bn(sd, f"{base}.norm1"),
                "conv1": _c(sd, f"{base}.conv1"),
                "norm2": _bn(sd, f"{base}.norm2"),
                "conv2": _c(sd, f"{base}.conv2"),
            }
        if bi != len(block_config):
            tb = f"fpn.features.transition{bi}"
            tr[f"transition{bi}"] = {
                "norm": _bn(sd, f"{tb}.norm"),
                "conv": _c(sd, f"{tb}.conv"),
            }
    params: Dict[str, Any] = {"features": tr}
    for k in range(5):
        params[f"lateral{k}"] = _c(sd, f"fpn.lateral{k}")
    for k in (1, 2, 3, 4):
        params[f"head{k}"] = {
            "block0": _c(sd, f"head{k}.block0"),
            "block1": _c(sd, f"head{k}.block1"),
        }
    params["smooth"] = {
        "conv": _c(sd, "smooth.0", bias=True),
        "norm": _bn(sd, "smooth.1"),
    }
    params["smooth2"] = {
        "conv": _c(sd, "smooth2.0", bias=True),
        "norm": _bn(sd, "smooth2.1"),
    }
    params["final"] = _c(sd, "final", bias=True)
    return {"params": params}
