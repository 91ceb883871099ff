"""Device mesh and sharding helpers.

The TPU-native replacement for the reference's torch.distributed/NCCL layer
(/root/reference/src/mair/basicsr/utils/dist_util.py): parallelism is
expressed as a `jax.sharding.Mesh` plus NamedShardings; XLA inserts the
collectives over ICI. Axes used across the framework:

  dp — data parallel (batch / patch-grid dimension)
  sp — spatial parallel (image height; XLA adds conv halo exchanges)
  tp — tensor parallel (wide channel dimensions of selected kernels)

The reference's two data-parallel mechanisms (DDP and nn.DataParallel,
SURVEY §2.5) both collapse into `dp`; its spatial tiling is `dp` over the
patch batch plus optional `sp` within a patch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a mesh. Default: all devices on one 'dp' axis."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"dp": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {axes} does not match {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, spatial_axis: Optional[str] = None) -> NamedSharding:
    """NHWC batch: shard N over 'dp' (and optionally H over spatial_axis)."""
    dp = "dp" if "dp" in mesh.axis_names else None
    return NamedSharding(mesh, P(dp, spatial_axis, None, None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh, min_dim: int = 128):
    """Tensor-parallel placement: shard the output-channel axis of large
    kernels over 'tp', replicate the rest. Returns a device_put pytree.

    XLA's sharding propagation turns these placements into all-gather /
    reduce-scatter pairs around the corresponding matmuls.
    """
    if "tp" not in mesh.axis_names:
        return jax.device_put(params, replicate(mesh))
    tp = mesh.shape["tp"]

    def place(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= max(min_dim, tp)
            and x.shape[-1] % tp == 0
        ):
            spec = [None] * x.ndim
            spec[-1] = "tp"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicate(mesh))

    return jax.tree_util.tree_map(place, params)
