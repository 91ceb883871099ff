"""Multi-process (multi-host) helpers — dist_util equivalents.

The reference's torch.distributed/NCCL launchers
(/root/reference/src/mair/basicsr/utils/dist_util.py:10-83) map to
jax.distributed: one process per host, devices per process, collectives
over ICI/DCN inserted by XLA from shardings. `master_only` gates IO to
process 0 exactly like the reference decorator.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax

_initialized = False


def init_dist(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed from args or environment.

    Env fallbacks: COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID (also
    understands SLURM_* via jax's own auto-detection when args are None).
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None and "SLURM_JOB_ID" not in os.environ:
        return  # single process
    kw = {}
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kw["num_processes"] = int(num_processes or os.environ["NUM_PROCESSES"])
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kw["process_id"] = int(
            process_id if process_id is not None else os.environ["PROCESS_ID"]
        )
    jax.distributed.initialize(**kw)
    _initialized = True


def get_dist_info() -> Tuple[int, int]:
    """(rank, world_size) — dist_util.get_dist_info parity."""
    return jax.process_index(), jax.process_count()


def master_only(func):
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if jax.process_index() == 0:
            return func(*args, **kwargs)

    return wrapper
