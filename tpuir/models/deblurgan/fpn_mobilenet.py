"""FPN-MobileNet generator (DeblurGANv2).

TPU-native re-design of /root/reference/src/deblurganv2/models/fpn_mobilenet.py
with the vendored MobileNetV2 backbone (mobilenet_v2.py:62-110). Only
features[0..15] are used by the FPN (enc taps after indices 1, 3, 6, 10, 15).
All norms run in train mode (see norms.py). Input/output are in [-1, 1].
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from jax import lax

from .fold import FinalTail, fold_s2_entry_kernel
from .norms import TrainNorm, upsample_nearest

# MobileNetV2 inverted-residual settings rows (t, c, n, s) expanded to the
# per-feature list: (expand_ratio, out_ch, stride) for features 1..15.
_MNV2_FEATURES = [
    (1, 16, 1),
    (6, 24, 2), (6, 24, 1),
    (6, 32, 2), (6, 32, 1), (6, 32, 1),
    (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),
    (6, 96, 1), (6, 96, 1), (6, 96, 1),
    (6, 160, 2), (6, 160, 1),
]


class _Conv3x3Param(nn.Module):
    """Bare (3,3,Cin,Cout) kernel param, pytree-identical to
    ``nn.Conv(name=...)`` without bias — so phase-folded apply paths load
    the same converted checkpoints."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, self.cin, self.cout)
        )


class _ConvBNRelu6(nn.Module):
    out: int
    stride: int
    phase_in: bool = False  # input is space_to_depth2 of the full-res image

    @nn.compact
    def __call__(self, x):
        if self.phase_in:
            assert self.stride == 2
            k = _Conv3x3Param(x.shape[-1] // 4, self.out, name="conv")()
            pk = fold_s2_entry_kernel(k, "same")
            x = lax.conv_general_dilated(
                x, pk.astype(x.dtype), (1, 1), ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = nn.Conv(
                self.out, (3, 3), strides=self.stride, padding=1,
                use_bias=False, name="conv",
            )(x)
        x = TrainNorm(self.out, affine=True, name="bn")(x)
        return jnp.clip(nn.relu(x), 0, 6.0)


class _InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x):
        hidden = round(self.inp * self.expand_ratio)
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, name="pw")(y)
            y = TrainNorm(hidden, affine=True, name="pw_bn")(y)
            y = jnp.clip(nn.relu(y), 0, 6.0)
        y = nn.Conv(
            hidden, (3, 3), strides=self.stride, padding=1,
            feature_group_count=hidden, use_bias=False, name="dw",
        )(y)
        y = TrainNorm(hidden, affine=True, name="dw_bn")(y)
        y = jnp.clip(nn.relu(y), 0, 6.0)
        y = nn.Conv(self.oup, (1, 1), use_bias=False, name="pw_linear")(y)
        y = TrainNorm(self.oup, affine=True, name="pw_linear_bn")(y)
        if self.stride == 1 and self.inp == self.oup:
            return x + y
        return y


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


class FPNMobileNet(nn.Module):
    output_ch: int = 3
    num_filters: int = 64
    num_filters_fpn: int = 128
    # Exact phase-domain fold of the final up2+conv3x3+tanh+skip (fold.py);
    # param-compatible with the unfolded tail (opt-in; measured
    # perf-neutral alone — benchmarks/ab_fold_tail.py).
    fold_tail: bool = False
    # Phase-layout IO: __call__ takes/returns (N, H/2, W/2, 4*3) space-to-
    # depth2 tensors (host-side relayout in native/tileblend.cpp), so the
    # device never touches a 3-lane full-resolution tensor — on TPU a
    # C-channel NHWC array occupies ceil(C/128)*128/C x its logical HBM
    # bytes, making the C=3 input/output streams the single largest cost
    # of the @2048 serving forward (benchmarks/probe_lane_layout.py).
    # Mathematically exact: entry conv and tail are re-folded from the
    # SAME checkpoint params (fold.py). zoo enables for serving.
    phase_io: bool = False

    @nn.compact
    def __call__(self, x):
        nf, nfp = self.num_filters, self.num_filters_fpn

        # Bottom-up backbone with taps matching the reference enc slices
        # (fpn_mobilenet.py:91-95): enc0=[0:2], enc1=[2:4], enc2=[4:7],
        # enc3=[7:11], enc4=[11:16].
        h = _ConvBNRelu6(32, 2, phase_in=self.phase_io, name="features_0")(x)
        taps = {}
        inp = 32
        for i, (t, c, s) in enumerate(_MNV2_FEATURES, start=1):
            h = _InvertedResidual(inp, c, s, t, name=f"features_{i}")(h)
            inp = c
            if i in (1, 3, 6, 10, 15):
                taps[i] = h
        enc0, enc1, enc2, enc3, enc4 = taps[1], taps[3], taps[6], taps[10], taps[15]

        lateral4 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral4")(enc4)
        lateral3 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral3")(enc3)
        lateral2 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral2")(enc2)
        lateral1 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral1")(enc1)
        lateral0 = nn.Conv(nfp // 2, (1, 1), use_bias=False, name="lateral0")(enc0)

        map4 = lateral4
        map3 = _ConvINRelu(nfp, name="td1")(lateral3 + upsample_nearest(map4, 2))
        map2 = _ConvINRelu(nfp, name="td2")(lateral2 + upsample_nearest(map3, 2))
        map1 = _ConvINRelu(nfp, name="td3")(lateral1 + upsample_nearest(map2, 2))

        map4 = upsample_nearest(_FPNHead(nf, nf, name="head4")(map4), 8)
        map3 = upsample_nearest(_FPNHead(nf, nf, name="head3")(map3), 4)
        map2 = upsample_nearest(_FPNHead(nf, nf, name="head2")(map2), 2)
        map1 = _FPNHead(nf, nf, name="head1")(map1)

        smoothed = _ConvINRelu(nf, name="smooth")(
            jnp.concatenate([map4, map3, map2, map1], axis=-1)
        )
        smoothed = upsample_nearest(smoothed, 2)
        smoothed = _ConvINRelu(nf // 2, name="smooth2")(smoothed + lateral0)

        return FinalTail(self.output_ch, fold=self.fold_tail,
                         phase_io=self.phase_io, name="final")(smoothed, x)


# ---------------------------------------------------------------------------
# Weight conversion from fpn_mobilenet.h5 ({'model': sd} with 'module.' keys)
# ---------------------------------------------------------------------------


def _f32(x):
    return np.asarray(x, np.float32)


def _conv_k(sd, name, bias=False):
    p = {"kernel": np.ascontiguousarray(_f32(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if bias:
        p["bias"] = _f32(sd[f"{name}.bias"])
    return p


def _bn(sd, name):
    return {"weight": _f32(sd[f"{name}.weight"]), "bias": _f32(sd[f"{name}.bias"])}


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    sd = strip_module_prefix(sd)
    params: Dict[str, Any] = {}

    params["features_0"] = {
        "conv": _conv_k(sd, "fpn.features.0.0"),
        "bn": _bn(sd, "fpn.features.0.1"),
    }
    for i, (t, c, s) in enumerate(_MNV2_FEATURES, start=1):
        base = f"fpn.features.{i}.conv"
        if t == 1:  # dw, bn, relu, pw, bn at indices 0,1,3,4
            params[f"features_{i}"] = {
                "dw": _conv_k(sd, f"{base}.0"),
                "dw_bn": _bn(sd, f"{base}.1"),
                "pw_linear": _conv_k(sd, f"{base}.3"),
                "pw_linear_bn": _bn(sd, f"{base}.4"),
            }
        else:  # pw, bn, relu, dw, bn, relu, pw, bn at 0,1,3,4,6,7
            params[f"features_{i}"] = {
                "pw": _conv_k(sd, f"{base}.0"),
                "pw_bn": _bn(sd, f"{base}.1"),
                "dw": _conv_k(sd, f"{base}.3"),
                "dw_bn": _bn(sd, f"{base}.4"),
                "pw_linear": _conv_k(sd, f"{base}.6"),
                "pw_linear_bn": _bn(sd, f"{base}.7"),
            }

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
