"""Training losses — the TPU-native equivalent of the vendored BasicSR loss
zoo (/root/reference/src/mair/basicsr/losses/losses.py).

All losses are pure functions (pred, target[, weight]) -> scalar or pytree-
friendly arrays; the ``reduction``/elementwise-weight semantics of BasicSR's
``@weighted_loss`` decorator (losses.py:15-30) are reproduced by
:func:`weighted_loss`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _reduce(x, reduction: str):
    if reduction == "none":
        return x
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise ValueError(reduction)


def weighted_loss(elementwise, pred, target, weight=None, reduction="mean"):
    loss = elementwise(pred, target)
    if weight is not None:
        loss = loss * weight
    return _reduce(loss, reduction)


def l1_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    return loss_weight * weighted_loss(
        lambda p, t: jnp.abs(p - t), pred, target, weight, reduction
    )


def mse_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    return loss_weight * weighted_loss(
        lambda p, t: (p - t) ** 2, pred, target, weight, reduction
    )


def charbonnier_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean",
                     eps=1e-12):
    return loss_weight * weighted_loss(
        lambda p, t: jnp.sqrt((p - t) ** 2 + eps), pred, target, weight, reduction
    )


def psnr_loss(pred, target, loss_weight=1.0, to_y=False):
    """Negative PSNR (BasicSR PSNRLoss, losses.py)."""
    if to_y:
        coef = jnp.asarray([65.481, 128.553, 24.966]) / 255.0
        pred = jnp.sum(pred * coef, axis=-1, keepdims=True) + 16.0 / 255.0
        target = jnp.sum(target * coef, axis=-1, keepdims=True) + 16.0 / 255.0
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return loss_weight * jnp.mean((10.0 / jnp.log(10.0)) * jnp.log(mse + 1e-8))


def weighted_tv_loss(pred, weight=None, loss_weight=1.0):
    """WeightedTVLoss: L1 total variation (losses.py WeightedTVLoss)."""
    wy = None if weight is None else weight[:, :-1, :, :]
    wx = None if weight is None else weight[:, :, :-1, :]
    y = l1_loss(pred[:, :-1, :, :], pred[:, 1:, :, :], weight=wy)
    x = l1_loss(pred[:, :, :-1, :], pred[:, :, 1:, :], weight=wx)
    return loss_weight * (x + y)


# -- GAN losses (BasicSR GANLoss, losses.py:~300-420) ------------------------


def gan_loss(pred, target_is_real: bool, gan_type: str = "vanilla",
             real_label_val: float = 1.0, fake_label_val: float = 0.0,
             is_disc: bool = False, loss_weight: float = 1.0):
    if gan_type == "vanilla":
        label = real_label_val if target_is_real else fake_label_val
        loss = jnp.mean(
            jnp.maximum(pred, 0) - pred * label + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    elif gan_type == "lsgan":
        label = real_label_val if target_is_real else fake_label_val
        loss = jnp.mean((pred - label) ** 2)
    elif gan_type == "wgan":
        loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    elif gan_type == "wgan_softplus":
        loss = (
            jnp.mean(jax.nn.softplus(-pred))
            if target_is_real
            else jnp.mean(jax.nn.softplus(pred))
        )
    elif gan_type == "hinge":
        if is_disc:
            p = -pred if target_is_real else pred
            loss = jnp.mean(jax.nn.relu(1 + p))
        else:
            loss = -jnp.mean(pred)
    else:
        raise NotImplementedError(f"GAN type {gan_type}")
    return loss if is_disc else loss * loss_weight


def r1_penalty(real_grad, real_img=None):
    """R1 gradient penalty given d(D)/d(real) (losses.py r1_penalty)."""
    return jnp.mean(jnp.sum(real_grad**2, axis=(1, 2, 3)))


def gradient_penalty(interp_grad, weight=None):
    """WGAN-GP penalty given d(D)/d(interpolates)."""
    if weight is not None:
        interp_grad = interp_grad * weight
    norm = jnp.sqrt(jnp.sum(interp_grad**2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2)


LOSS_REGISTRY = {
    "L1Loss": l1_loss,
    "MSELoss": mse_loss,
    "CharbonnierLoss": charbonnier_loss,
    "PSNRLoss": psnr_loss,
    "WeightedTVLoss": weighted_tv_loss,
}


def build_loss(opt: dict):
    """Build a loss closure from a BasicSR-style pixel_opt dict."""
    import inspect

    opt = dict(opt)
    fn = LOSS_REGISTRY[opt.pop("type")]
    accepted = set(inspect.signature(fn).parameters)
    return partial(fn, **{k: v for k, v in opt.items() if k in accepted})
