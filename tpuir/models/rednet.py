"""REDNet: 30-layer conv encoder-decoder with symmetric elementwise skips.

TPU-native re-design of the reference architecture
(/root/reference/src/rednet/rednet.py:15-136). The reference's "deconv"
layers are ``ConvTranspose2d(k=3, s=1, p=1)`` — same-spatial-size transposed
convolutions, which are mathematically plain correlations with the kernel
spatially flipped and in/out channels swapped. We therefore express the
whole network as 30 ``nn.Conv`` layers (ideal for the MXU) and perform the
flip/swap in the weight converter.

Skip pattern (rednet.py:84-136): after every odd deconv k (1,3,5,...,13),
add encoder feature c(15-k) and re-ReLU; final output adds the input.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class REDNet(nn.Module):
    num_channels: int = 1
    num_features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.astype(self.dtype)
        enc = []
        for i in range(1, 16):
            y = nn.Conv(
                self.num_features, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}"
            )(y)
            y = nn.relu(y)
            enc.append(y)  # enc[i-1] = c_i

        for k in range(1, 15):
            y = nn.Conv(
                self.num_features, (3, 3), padding=1, dtype=self.dtype, name=f"deconv{k}"
            )(y)
            y = nn.relu(y)
            if k % 2 == 1:  # symmetric skip: d1+c14, d3+c12, ..., d13+c2
                y = nn.relu(y + enc[14 - k])  # c_(15-k) is enc[14-k]
        d15 = nn.Conv(
            self.num_channels, (3, 3), padding=1, dtype=self.dtype, name="deconv15"
        )(y)
        return d15.astype(x.dtype) + x


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _deconv_to_conv_hwio(w: np.ndarray) -> np.ndarray:
    """ConvTranspose2d weight (in, out, kh, kw) -> equivalent correlation
    kernel in HWIO: flip spatial dims, treat axis0 as I and axis1 as O."""
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Map the converted-caffe ``{conv*,deconv*}.{weight,bias}`` blobs.

    Mirrors the reference's ``strict=False`` load (src/rednet/__init__.py:20):
    missing keys keep zero-init (the caffe converter emits exactly these 30
    layers, so in practice all are present).
    """
    params = {}
    for i in range(1, 16):
        name = f"conv{i}"
        if f"{name}.weight" in sd:
            params[name] = {
                "kernel": _oihw_to_hwio(np.asarray(sd[f"{name}.weight"], np.float32)),
                "bias": np.asarray(sd[f"{name}.bias"], np.float32),
            }
    for i in range(1, 16):
        name = f"deconv{i}"
        if f"{name}.weight" in sd:
            params[name] = {
                "kernel": _deconv_to_conv_hwio(np.asarray(sd[f"{name}.weight"], np.float32)),
                "bias": np.asarray(sd[f"{name}.bias"], np.float32),
            }
    return {"params": params}
