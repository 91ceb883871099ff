"""Training core: state, optimizer, sharded train step, EMA.

The TPU-native equivalent of BasicSR's model-wrapper training machinery
(/root/reference/src/mair/basicsr/models/base_model.py, sr_model.py):
optimizer/scheduler setup, EMA, gradient clipping, and the DDP layer —
which here is a jit-compiled step whose parallelism comes entirely from
shardings (see tpuir/parallel/mesh.py): batch over 'dp' (+ 'sp' spatial),
selected weights over 'tp'. XLA inserts the gradient all-reduces that DDP
performed with NCCL.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx, ema_decay: Optional[float] = None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # real copies — identical buffers would break argument donation
            ema_params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
            if ema_decay
            else None,
        )


def build_optimizer(opt: dict, schedule) -> optax.GradientTransformation:
    """BasicSR optim_g dict -> optax chain. Supports Adam/AdamW + grad clip."""
    opt = dict(opt)
    kind = opt.pop("type", "Adam")
    betas = opt.pop("betas", (0.9, 0.999))
    weight_decay = opt.pop("weight_decay", 0.0)
    opt.pop("lr", None)
    if kind == "AdamW":
        core = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    elif kind == "Adam":
        core = optax.adam(schedule, b1=betas[0], b2=betas[1])
    else:
        raise NotImplementedError(kind)
    return core


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    ema_decay: Optional[float] = None,
    grad_clip: Optional[float] = 0.01,
):
    """Returns jittable step(state, batch) -> (state, metrics).

    batch = {'lq': NHWC, 'gt': NHWC}. grad_clip mirrors BasicSR's
    use_grad_clip (clip_grad_norm_(0.01) in sr_model.py).
    """

    def step(state: TrainState, batch):
        def loss_of(params):
            pred = apply_fn(params, batch["lq"])
            return loss_fn(pred, batch["gt"])

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        if grad_clip:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        else:
            gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None and ema_decay:
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema_params, params
            )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params,
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step
