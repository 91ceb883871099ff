"""DnCNN: plain conv stack predicting the noise residual.

TPU-native re-design of the reference architecture
(/root/reference/src/dncnn/models/network_dncnn.py:40-71): nb conv layers of
width nc with ReLU between (BN is pre-merged into the released weights, so
act mode is 'R'), output is ``x - f(x)``. Layout is NHWC; weights come from
the KAIR checkpoints via :func:`convert_state_dict`.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class DnCNN(nn.Module):
    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64
    nb: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.astype(self.dtype)
        y = nn.Conv(self.nc, (3, 3), padding=1, dtype=self.dtype, name="conv0")(y)
        y = nn.relu(y)
        for i in range(1, self.nb - 1):
            y = nn.Conv(self.nc, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(y)
            y = nn.relu(y)
        n = nn.Conv(
            self.out_nc, (3, 3), padding=1, dtype=self.dtype, name=f"conv{self.nb - 1}"
        )(y)
        return x - n.astype(x.dtype)


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def convert_state_dict(sd: Dict[str, np.ndarray], nb: int) -> Dict:
    """torch state_dict -> flax params.

    The reference builds the net as a flattened Sequential of (conv, relu)
    pairs, so conv i lives at ``model.{2*i}`` (network_dncnn.py:63-67).
    """
    params = {}
    for i in range(nb):
        w = np.asarray(sd[f"model.{2 * i}.weight"], dtype=np.float32)
        b = np.asarray(sd[f"model.{2 * i}.bias"], dtype=np.float32)
        params[f"conv{i}"] = {"kernel": _oihw_to_hwio(w), "bias": b}
    return {"params": params}
