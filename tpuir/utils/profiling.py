"""Tracing / profiling utilities (SURVEY §5: the reference only had
torch.profiler FLOPs and wall-clock; the TPU equivalents are jax.profiler
traces and XLA cost analysis).

Set TPUIR_TRACE_DIR to capture a TensorBoard-compatible trace around any
`with maybe_trace("name"):` region (the engine wraps its device pipeline),
or use `trace_fn` to profile one callable.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def maybe_trace(name: str, trace_dir: Optional[str] = None):
    trace_dir = trace_dir or os.environ.get("TPUIR_TRACE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield


def trace_fn(fn: Callable, *args, trace_dir: str = "/tmp/tpuir_trace", **kw):
    """Run fn twice (compile, then traced) and return (result, trace_dir)."""
    fn(*args, **kw)
    with jax.profiler.trace(trace_dir):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return out, trace_dir


def xla_cost(fn: Callable, *args):
    """FLOPs / bytes from the compiled cost analysis of fn(*args)."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return cost


def check_nan_inf(tree, name: str = "tensor") -> bool:
    """Debug guard (reference csms6s.check_nan_inf equivalent): returns True
    and prints when any leaf holds NaN/Inf."""
    import numpy as np

    bad = False
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            n_nan = int(np.isnan(arr).sum())
            n_inf = int(np.isinf(arr).sum())
            print(f"[check_nan_inf] {name}{jax.tree_util.keystr(path)}: "
                  f"{n_nan} NaN, {n_inf} Inf")
            bad = True
    return bad


class Timer:
    """Wall-clock timer matching the engine's ms convention."""

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.ms = (time.time() - self.t0) * 1000.0
