"""Small host-side helpers shared across the framework."""

from __future__ import annotations

import jax
import numpy as np


def param_count(params) -> int:
    """Total number of scalar parameters in a pytree.

    Mirrors the reference's ``get_model_total_parameters``
    (/root/reference/src/utils.py:25-26) for the harness's param-count column.
    """
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def tree_size_bytes(params) -> int:
    return int(
        sum(np.prod(x.shape) * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
    )
