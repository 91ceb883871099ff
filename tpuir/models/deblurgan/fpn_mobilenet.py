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

from .fold import (
    FinalTail,
    depth_to_space,
    derive_packed_kernel,
    derive_packed_kernel_strided,
    packed_pw_kernel,
    space_to_depth,
)
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


def _conv_same(x, k, stride=1):
    p = ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2)
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), p,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _Conv1x1Param(nn.Module):
    """Bare (1,1,Cin,Cout) kernel param mirroring ``nn.Conv(use_bias=False)``."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.cin, self.cout)
        )


class _ConvDWParam(nn.Module):
    """Bare (3,3,1,C) depthwise kernel param mirroring the grouped nn.Conv."""

    ch: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, self.ch)
        )


def _packed_dw_kernel(kd, ch, stride):
    """Pack2 dense equivalent of a SAME-padded depthwise 3x3 conv."""

    def dw(a):
        return lax.conv_general_dilated(
            a, kd, (stride, stride), ((1, 1), (1, 1)), feature_group_count=ch,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def m(xp):
        return space_to_depth(dw(depth_to_space(xp, 2, ch)), 2)

    if stride == 1:
        return derive_packed_kernel(m, 4 * ch, 3)
    return derive_packed_kernel_strided(m, 4 * ch, 3, stride)


class _ConvBNRelu6(nn.Module):
    out: int
    stride: int
    # pack4_entry: input is space_to_depth(image, 4) — (N, H/4, W/4, 16*3);
    # the stride-2 entry conv becomes one stride-1 (3,3,48,4*out) conv
    # whose output is pack2 of the logical (H/2, W/2, out) feature map
    # (4.64 -> 0.47 ms @2048, benchmarks/explore_packed_conv.py)
    pack4_entry: bool = False

    @nn.compact
    def __call__(self, x):
        if self.pack4_entry:
            assert self.stride == 2
            cin = x.shape[-1] // 16
            k = _Conv3x3Param(cin, self.out, name="conv")()

            def entry_map(xp):
                xx = depth_to_space(xp, 4, cin)
                return space_to_depth(_conv_same(xx, k, stride=2), 2)

            pk = derive_packed_kernel(entry_map, x.shape[-1], 3)
            x = _conv_same(x, pk)
            x = TrainNorm(self.out, affine=True, phases=4, name="bn")(x)
            return jnp.clip(nn.relu(x), 0, 6.0)
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
    # packed: input/output are pack2 of the logical tensors; pointwise
    # convs become block-diagonal, the depthwise conv a dense pack2
    # equivalent, norms reduce over phases. Exact, same params
    # (benchmarks/explore_packed_conv.py, explore_packed2.py).
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = round(self.inp * self.expand_ratio)
        if self.packed:
            y = x
            if self.expand_ratio != 1:
                kpw = _Conv1x1Param(self.inp, hidden, name="pw")()
                y = _conv_same(y, packed_pw_kernel(kpw))
                y = TrainNorm(hidden, affine=True, phases=4, name="pw_bn")(y)
                y = jnp.clip(nn.relu(y), 0, 6.0)
            kd = _ConvDWParam(hidden, name="dw")()
            y = _conv_same(y, _packed_dw_kernel(kd, hidden, self.stride),
                           stride=self.stride)
            y = TrainNorm(hidden, affine=True, phases=4, name="dw_bn")(y)
            y = jnp.clip(nn.relu(y), 0, 6.0)
            kpl = _Conv1x1Param(hidden, self.oup, name="pw_linear")()
            y = _conv_same(y, packed_pw_kernel(kpl))
            y = TrainNorm(self.oup, affine=True, phases=4, name="pw_linear_bn")(y)
            if self.stride == 1 and self.inp == self.oup:
                return x + y
            return y
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


class _ConvBiasParam(nn.Module):
    """Bare kernel+bias params mirroring ``nn.Conv(name=...)`` with bias."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, self.cin, self.cout)
        )
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


class _ConvINRelu(nn.Module):
    out: int
    packed: bool = False  # pack2 in/out, same params

    @nn.compact
    def __call__(self, x):
        if self.packed:
            cin = x.shape[-1] // 4
            k, b = _ConvBiasParam(cin, self.out, name="conv")()

            def m(sp):
                return space_to_depth(_conv_same(depth_to_space(sp, 2, cin), k), 2)

            pk = derive_packed_kernel(m, x.shape[-1], 3)
            x = _conv_same(x, pk) + jnp.tile(b, 4).astype(x.dtype)
            x = TrainNorm(self.out, affine=False, phases=4, name="norm")(x)
            return nn.relu(x)
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
    # Phase-layout serving path: __call__ takes/returns pack4 tensors
    # (N, H/4, W/4, 16*3) = space_to_depth(image, 4) (host-side relayout
    # fused into the native patch gather/blend, native/tileblend.cpp).
    # On TPU, convs whose channel count is far below the 128-lane tile run
    # at tile-fill efficiency (final conv 32->3 @2048: 12.4 ms at 14.8x
    # its roofline — benchmarks/micro_mobilenet.py), so serving re-folds
    # every logical >=1024^2 conv into a phase-packed equivalent with
    # kernels derived NUMERICALLY from the SAME checkpoint params
    # (fold.py derive_packed_kernel*): the entry conv, features_1/2, the
    # lateral0 pointwise, smooth2 (with its upsample absorbed as a
    # channel tile), and the final up2+conv+tanh+skip tail. Exact by
    # construction; measured stage wins in benchmarks/explore_packed_conv.py
    # and explore_packed2.py. zoo enables for precision='serving'.
    phase_io: bool = False

    @nn.compact
    def __call__(self, x):
        nf, nfp = self.num_filters, self.num_filters_fpn

        # Bottom-up backbone with taps matching the reference enc slices
        # (fpn_mobilenet.py:91-95): enc0=[0:2], enc1=[2:4], enc2=[4:7],
        # enc3=[7:11], enc4=[11:16].
        phase = self.phase_io
        h = _ConvBNRelu6(32, 2, pack4_entry=phase, name="features_0")(x)
        taps = {}
        inp = 32
        for i, (t, c, s) in enumerate(_MNV2_FEATURES, start=1):
            h = _InvertedResidual(inp, c, s, t, packed=phase and i <= 2,
                                  name=f"features_{i}")(h)
            inp = c
            if i in (1, 3, 6, 10, 15):
                taps[i] = h
            if phase and i == 2:
                # leave the packed region: deeper stages run at logical
                # <=512^2 where direct convs are near-roofline (the seam
                # measured 0.025 ms — benchmarks/explore_packed2.py)
                h = depth_to_space(h, 2, c)
        enc0, enc1, enc2, enc3, enc4 = taps[1], taps[3], taps[6], taps[10], taps[15]

        lateral4 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral4")(enc4)
        lateral3 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral3")(enc3)
        lateral2 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral2")(enc2)
        lateral1 = nn.Conv(nfp, (1, 1), use_bias=False, name="lateral1")(enc1)
        if phase:
            # enc0 is pack2 of the logical (H/2, W/2, 16) map
            kl0 = _Conv1x1Param(16, nfp // 2, name="lateral0")()
            lateral0 = _conv_same(enc0, packed_pw_kernel(kl0))
        else:
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
        if phase:
            # nearest-up2 in pack2 layout is a channel tile (each logical
            # pixel fills all four phases of its block)
            sm4 = jnp.tile(smoothed, (1, 1, 1, 4)) + lateral0
            smoothed2 = _ConvINRelu(nf // 2, packed=True, name="smooth2")(sm4)
            return FinalTail(self.output_ch, phase_io=True,
                             name="final")(smoothed2, x)
        smoothed = upsample_nearest(smoothed, 2)
        smoothed = _ConvINRelu(nf // 2, name="smooth2")(smoothed + lateral0)

        return FinalTail(self.output_ch, fold=self.fold_tail,
                         name="final")(smoothed, x)


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
