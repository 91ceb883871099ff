"""DeblurGAN(v1-style) ResNet generator.

TPU-native Flax port of the reference ResnetGenerator
(/root/reference/src/deblurganv2/models/networks.py:36-130 — dead code in
the tested path, selectable via ``g_name: resnet``). NHWC; reflect-padded
7x7 stem/head, two stride-2 downsamples, n residual blocks, two
ConvTranspose upsamples (k3 s2 p1 output_padding=1), tanh head, optional
learned residual with [-1, 1] clamp. Norms run in train mode like every
served DeblurGAN generator (per-sample statistics — see norms.TrainNorm).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpuir.models.deblurgan.norms import TrainNorm


def _convT_s2(x, kernel_oihw, bias):
    """torch ConvTranspose2d(k3, s2, p1, output_padding=1) == input dilated
    by 2, correlated with the spatially-flipped kernel, padding (1, 2)."""
    k = jnp.flip(kernel_oihw, axis=(2, 3)).transpose(2, 3, 0, 1)  # HW I O
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


class _ResnetBlock(nn.Module):
    dim: int
    norm: str = "instance"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bias = self.norm == "instance"
        h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.dim, (3, 3), padding=0, use_bias=bias, name="conv1")(h)
        h = nn.relu(TrainNorm(self.dim, affine=self.norm == "batch",
                              name="norm1")(h))
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=deterministic)(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.dim, (3, 3), padding=0, use_bias=bias, name="conv2")(h)
        h = TrainNorm(self.dim, affine=self.norm == "batch", name="norm2")(h)
        return x + h


class ResnetGenerator(nn.Module):
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    norm: str = "instance"
    use_dropout: bool = False
    n_blocks: int = 6
    learn_residual: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bias = self.norm == "instance"
        affine = self.norm == "batch"
        inp = x
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.ngf, (7, 7), padding=0, use_bias=bias, name="stem")(h)
        h = nn.relu(TrainNorm(self.ngf, affine=affine, name="stem_norm")(h))
        for i in range(2):
            mult = 2**i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2), padding=1,
                        use_bias=bias, name=f"down{i}")(h)
            h = nn.relu(TrainNorm(self.ngf * mult * 2, affine=affine,
                                  name=f"down{i}_norm")(h))
        for i in range(self.n_blocks):
            h = _ResnetBlock(self.ngf * 4, self.norm, self.use_dropout,
                             name=f"block{i}")(h, deterministic)
        for i in range(2):
            mult = 2 ** (2 - i)
            out_ch = self.ngf * mult // 2
            kern = self.param(
                f"up{i}_kernel",
                nn.initializers.lecun_normal(),
                (self.ngf * mult, out_ch, 3, 3),  # torch (in, out, kh, kw)
            )
            b = (
                self.param(f"up{i}_bias", nn.initializers.zeros, (out_ch,))
                if bias else None
            )
            h = _convT_s2(h, kern, b)
            h = nn.relu(TrainNorm(out_ch, affine=affine, name=f"up{i}_norm")(h))
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.output_nc, (7, 7), padding=0, name="head")(h)
        h = jnp.tanh(h)
        if self.learn_residual:
            h = jnp.clip(inp + h, -1.0, 1.0)
        return h


def _conv_p(sd, k, bias=True):
    w = np.asarray(sd[f"{k}.weight"], np.float32)
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if bias and f"{k}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{k}.bias"], np.float32)
    return p


def convert_state_dict(sd: Dict[str, np.ndarray], n_blocks: int = 6,
                       norm: str = "instance") -> Dict:
    """torch ResnetGenerator state_dict (``model.N.*`` Sequential slots) ->
    Flax params. Slot layout: 1 stem, downs at 4/7, blocks from 10, ups at
    10+n/13+n, head at 17+n."""
    if norm != "instance":
        raise NotImplementedError(
            "converter supports the released instance-norm layout only"
        )
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params: Dict[str, Any] = {"stem": _conv_p(sd, "model.1")}
    params["down0"] = _conv_p(sd, "model.4")
    params["down1"] = _conv_p(sd, "model.7")
    for i in range(n_blocks):
        base = f"model.{10 + i}.conv_block"
        # dropout (when present) shifts conv2 from slot 5 to slot 6
        c2 = f"{base}.6" if f"{base}.6.weight" in sd else f"{base}.5"
        params[f"block{i}"] = {
            "conv1": _conv_p(sd, f"{base}.1"),
            "conv2": _conv_p(sd, c2),
        }
    upat = 10 + n_blocks
    for i in range(2):
        k = f"model.{upat + 3 * i}"
        params[f"up{i}_kernel"] = np.asarray(sd[f"{k}.weight"], np.float32)
        if f"{k}.bias" in sd:
            params[f"up{i}_bias"] = np.asarray(sd[f"{k}.bias"], np.float32)
    params["head"] = _conv_p(sd, f"model.{upat + 7}")
    return {"params": params}
