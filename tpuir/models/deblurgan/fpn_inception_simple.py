"""FPN-Inception-Simple generator (DeblurGANv2, dead code in the reference's
tested path — selectable via ``g_name: fpn_inception_simple``).

TPU-native port of /root/reference/src/deblurganv2/models/fpn_inception_simple.py.
Identical to FPNInception except the top-down pathway adds laterals raw
(no conv-norm-relu td blocks, fpn_inception_simple.py:158-165); heads,
smooth stages, trunk, and the reflect re-alignment pads are shared.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .fpn_inception import _ConvINRelu, _FPNHead, _reflect_pad
from .inception_resnet_v2 import InceptionTrunk, convert_trunk, _conv_k
from .norms import upsample_nearest


class FPNInceptionSimple(nn.Module):
    output_ch: int = 3
    num_filters: int = 128
    num_filters_fpn: int = 256

    @nn.compact
    def __call__(self, x):
        nf, nfp = self.num_filters, self.num_filters_fpn

        enc0, enc1, enc2, enc3, enc4 = InceptionTrunk(name="inception")(x)

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

        # top-down pathway: raw sums (no td conv blocks)
        map4 = lateral4
        map3 = lateral3 + upsample_nearest(map4, 2)
        map2 = _reflect_pad(lateral2, (1, 2, 1, 2)) + upsample_nearest(map3, 2)
        map1 = lateral1 + upsample_nearest(map2, 2)
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
        smoothed = upsample_nearest(smoothed, 2)

        final = nn.Conv(self.output_ch, (3, 3), padding=1, name="final")(smoothed)
        return jnp.clip(jnp.tanh(final) + x, -1.0, 1.0)


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    from .fpn_mobilenet import strip_module_prefix

    sd = strip_module_prefix(sd)
    params: Dict[str, Any] = {"inception": convert_trunk(sd, "fpn.inception")}
    for k in range(5):
        params[f"lateral{k}"] = _conv_k(sd, f"fpn.lateral{k}")
    for k in (1, 2, 3, 4):
        params[f"head{k}"] = {
            "block0": _conv_k(sd, f"head{k}.block0"),
            "block1": _conv_k(sd, f"head{k}.block1"),
        }
    params["smooth"] = {"conv": _conv_k(sd, "smooth.0", bias=True)}
    params["smooth2"] = {"conv": _conv_k(sd, "smooth2.0", bias=True)}
    params["final"] = _conv_k(sd, "final", bias=True)
    return {"params": params}
