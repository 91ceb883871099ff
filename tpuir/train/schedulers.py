"""Learning-rate schedules — BasicSR scheduler parity as optax schedules.

Re-implements MultiStepRestartLR / CosineAnnealingRestartLR
(/root/reference/src/mair/basicsr/models/lr_scheduler.py:6-120) and fork B's
CosineAnnealingRestartCyclicLR (used by the Restormer training configs,
e.g. GaussianColorDenoising_RestormerSigma15.yml:84-88) as step -> lr
callables. All are jnp-traceable, so they compile inside the jitted train
step (optax scale_by_schedule).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def multi_step_restart_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    restarts: Sequence[int] = (0,),
    restart_weights: Sequence[float] = (1,),
):
    ms = jnp.asarray(sorted(milestones), jnp.int32)
    rs = jnp.asarray(list(restarts), jnp.int32)
    rw = jnp.asarray(list(restart_weights), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        lr = base_lr * gamma ** jnp.sum(step >= ms)  # == bisect_right count
        is_restart = jnp.any(step == rs)
        w = rw[jnp.argmax(rs == step)]
        return jnp.where(is_restart, base_lr * w, lr)

    return schedule


def _cosine_restart(base_lr, periods, restart_weights, eta_mins):
    cum = jnp.asarray(
        [sum(periods[: i + 1]) for i in range(len(periods))], jnp.int32
    )
    pr = jnp.asarray(list(periods), jnp.float32)
    rw = jnp.asarray(list(restart_weights), jnp.float32)
    em = jnp.asarray(list(eta_mins), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        # first index i with step <= cum[i] (lr_scheduler.py
        # get_position_from_periods), clamped to the last period
        idx = jnp.clip(jnp.searchsorted(cum, step, side="left"), 0, len(periods) - 1)
        weight = rw[idx]
        eta_min = em[idx]
        nearest_restart = jnp.where(idx == 0, 0, cum[jnp.maximum(idx - 1, 0)])
        period = pr[idx]
        frac = (step - nearest_restart).astype(jnp.float32) / period
        return eta_min + weight * 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * frac)
        )

    return schedule


def cosine_annealing_restart_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1,),
    eta_min: float = 0.0,
):
    """Cosine annealing to a single eta_min with per-period restart weights."""
    return _cosine_restart(base_lr, periods, restart_weights, [eta_min] * len(periods))


def cosine_annealing_restart_cyclic_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1,),
    eta_mins: Sequence[float] = (0.0,),
):
    """Per-period eta_min variant (fork B lr_scheduler)."""
    return _cosine_restart(base_lr, periods, restart_weights, eta_mins)


def true_cosine_annealing_lr(base_lr: float, T_max: int, eta_min: float = 0.0):
    def schedule(step):
        s = jnp.minimum(jnp.asarray(step, jnp.float32), T_max)
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * s / T_max)) / 2

    return schedule


def build_scheduler(base_lr: float, opt: dict):
    opt = dict(opt)
    kind = opt.pop("type")
    if kind in ("MultiStepLR", "MultiStepRestartLR"):
        return multi_step_restart_lr(base_lr, **opt)
    if kind == "CosineAnnealingRestartLR":
        return cosine_annealing_restart_lr(base_lr, **opt)
    if kind == "CosineAnnealingRestartCyclicLR":
        return cosine_annealing_restart_cyclic_lr(base_lr, **opt)
    if kind == "TrueCosineAnnealingLR":
        return true_cosine_annealing_lr(base_lr, opt["T_max"], opt.get("eta_min", 0))
    raise NotImplementedError(kind)
