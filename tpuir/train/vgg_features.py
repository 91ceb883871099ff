"""VGG19 conv3_3 feature trunk for DeblurGANv2's PerceptualLoss.

Re-implementation of the torchvision ``vgg19().features[:15]`` slice the
reference builds at /root/reference/src/deblurganv2/models/losses.py:28-39
(layers through index 14 == conv3_3, output WITHOUT a trailing ReLU).
Weights come from a user-supplied torchvision VGG19 checkpoint via
``convert_vgg19_features`` — torchvision is not vendored.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import numpy as np

# torchvision vgg19 features[0..14]: (conv out-channels, sequential index)
_CONVS = [(64, 0), (64, 2), (128, 5), (128, 7), (256, 10), (256, 12), (256, 14)]
_POOL_AFTER = {2, 7}  # maxpool follows these sequential indices (4 and 9)

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class VGG19Conv33(nn.Module):
    """Input NHWC in ImageNet-normalized space; output conv3_3 pre-ReLU."""

    @nn.compact
    def __call__(self, x):
        for feats, idx in _CONVS:
            x = nn.Conv(feats, (3, 3), padding=1, name=f"features_{idx}")(x)
            if idx != 14:
                x = nn.relu(x)
            if idx in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def convert_vgg19_features(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg19 state_dict (or its ``features.``-prefixed slice)
    -> Flax params for VGG19Conv33."""
    params = {}
    for _, idx in _CONVS:
        k = f"features.{idx}" if f"features.{idx}.weight" in sd else str(idx)
        w = np.asarray(sd[f"{k}.weight"], np.float32)
        params[f"features_{idx}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{k}.bias"], np.float32),
        }
    return {"params": params}
