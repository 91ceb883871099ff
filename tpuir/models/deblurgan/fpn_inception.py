"""FPN-Inception generator (DeblurGANv2).

TPU-native re-design of /root/reference/src/deblurganv2/models/fpn_inception.py.
The Inception-ResNet-v2 trunk produces VALID-padded (shrinking) feature
maps, so the reference re-aligns scales with reflect pads on the laterals
(fpn_inception.py:157-170); those pads are reproduced exactly. All norms
run in train mode; input/output are in [-1, 1].
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .fold import FinalTail, depth_to_space, space_to_depth
from .inception_resnet_v2 import InceptionTrunk, convert_trunk, _conv_k
from .norms import TrainNorm, upsample_nearest


def _reflect_pad(x, pad):
    """pad = (left, right, top, bottom) on H/W of NHWC, torch F.pad order."""
    l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="reflect")


class _FPNHead(nn.Module):
    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.mid, (3, 3), padding=1, use_bias=False, name="block0")(x))
        return nn.relu(nn.Conv(self.out, (3, 3), padding=1, use_bias=False, name="block1")(x))


class _ConvINRelu(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, (3, 3), padding=1, name="conv")(x)
        x = TrainNorm(self.out, affine=False, name="norm")(x)
        return nn.relu(x)


class FPNInception(nn.Module):
    output_ch: int = 3
    num_filters: int = 128
    num_filters_fpn: int = 256
    # Exact phase-domain fold of the final up2+conv3x3+tanh+skip (fold.py).
    fold_tail: bool = False
    # Phase-packed tail with in-model relayouts: the 64->3 up2+conv tail
    # (the generator's worst lane-fill op) becomes one (3,3,256,48) MXU
    # conv between device-side space_to_depth/depth_to_space. Unlike
    # MobileNet's full pack4 path, the VALID-padded Inception trunk can't
    # stay grid-aligned under packing, so only the tail packs. Exact;
    # A/B'd in benchmarks/ab_inception_tail.py.
    packed_tail: bool = False

    @nn.compact
    def __call__(self, x):
        nf, nfp = self.num_filters, self.num_filters_fpn

        enc0, enc1, enc2, enc3, enc4 = InceptionTrunk(name="inception")(x)

        # Laterals; the ReflectionPad2d(1) of the reference pads symmetric 1.
        lateral4 = _reflect_pad(
            nn.Conv(nfp, (1, 1), use_bias=False, name="lateral4")(enc4), (1, 1, 1, 1)
        )
        lateral3 = _reflect_pad(
            nn.Conv(nfp, (1, 1), use_bias=False, name="lateral3")(enc3), (1, 1, 1, 1)
        )
        lateral2 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral2")(enc2)
        lateral1 = _reflect_pad(
            nn.Conv(nfp, (1, 1), use_bias=False, name="lateral1")(enc1), (1, 1, 1, 1)
        )
        lateral0 = nn.Conv(nfp // 2, (1, 1), use_bias=False, name="lateral0")(enc0)

        map4 = lateral4
        map3 = _ConvINRelu(nfp, name="td1")(lateral3 + upsample_nearest(map4, 2))
        map2 = _ConvINRelu(nfp, name="td2")(
            _reflect_pad(lateral2, (1, 2, 1, 2)) + upsample_nearest(map3, 2)
        )
        map1 = _ConvINRelu(nfp, name="td3")(lateral1 + upsample_nearest(map2, 2))
        map0 = _reflect_pad(lateral0, (0, 1, 0, 1))

        map4 = upsample_nearest(_FPNHead(nf, nf, name="head4")(map4), 8)
        map3 = upsample_nearest(_FPNHead(nf, nf, name="head3")(map3), 4)
        map2 = upsample_nearest(_FPNHead(nf, nf, name="head2")(map2), 2)
        map1 = _FPNHead(nf, nf, name="head1")(map1)

        smoothed = _ConvINRelu(nf, name="smooth")(
            jnp.concatenate([map4, map3, map2, map1], axis=-1)
        )
        smoothed = upsample_nearest(smoothed, 2)
        smoothed = _ConvINRelu(nf // 2, name="smooth2")(smoothed + map0)

        if (self.packed_tail and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
                and 2 * smoothed.shape[1] == x.shape[1]
                and 2 * smoothed.shape[2] == x.shape[2]):
            sp = space_to_depth(smoothed, 2)
            x16 = space_to_depth(x, 4)
            y16 = FinalTail(self.output_ch, phase_io=True, name="final")(sp, x16)
            return depth_to_space(y16, 4, 3)
        return FinalTail(self.output_ch, fold=self.fold_tail, name="final")(smoothed, x)


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    from .fpn_mobilenet import strip_module_prefix

    sd = strip_module_prefix(sd)
    params: Dict[str, Any] = {"inception": convert_trunk(sd, "fpn.inception")}
    for k in range(5):
        params[f"lateral{k}"] = _conv_k(sd, f"fpn.lateral{k}")
    for k in (1, 2, 3):
        params[f"td{k}"] = {"conv": _conv_k(sd, f"fpn.td{k}.0", bias=True)}
    for k in (1, 2, 3, 4):
        params[f"head{k}"] = {
            "block0": _conv_k(sd, f"head{k}.block0"),
            "block1": _conv_k(sd, f"head{k}.block1"),
        }
    params["smooth"] = {"conv": _conv_k(sd, "smooth.0", bias=True)}
    params["smooth2"] = {"conv": _conv_k(sd, "smooth2.0", bias=True)}
    params["final"] = _conv_k(sd, "final", bias=True)
    return {"params": params}
