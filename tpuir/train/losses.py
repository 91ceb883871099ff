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
    if weight is None or reduction == "sum":
        return _reduce(loss, reduction)
    if reduction == "mean":
        # mean over the weighted region (reference loss_util.py:44-52):
        # denominator is the weight sum, with a single-channel weight
        # broadcasting across the channel axis (NHWC here, NCHW there)
        denom = jnp.sum(weight)
        if loss.ndim >= 1 and weight.shape[-1] == 1 and loss.shape[-1] > 1:
            denom = denom * loss.shape[-1]
        return jnp.sum(loss) / denom
    return loss  # 'none' with weight: weighted, unreduced


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


def multi_scale_gan_loss(preds, target_is_real: bool, gan_type: str = "vanilla",
                         real_label_val: float = 1.0, fake_label_val: float = 0.0,
                         is_disc: bool = False, loss_weight: float = 1.0):
    """MultiScaleGANLoss (reference losses.py:364-389): ``preds`` is a list
    of per-scale predictions (or a list of per-layer lists, in which case
    only the last layer of each scale enters the GAN loss); the result is
    the mean over scales. A bare array falls through to :func:`gan_loss`."""
    if isinstance(preds, (list, tuple)):
        total = 0.0
        for pred_i in preds:
            if isinstance(pred_i, (list, tuple)):
                pred_i = pred_i[-1]
            total = total + gan_loss(
                pred_i, target_is_real, gan_type, real_label_val,
                fake_label_val, is_disc, loss_weight,
            )
        return total / len(preds)
    return gan_loss(preds, target_is_real, gan_type, real_label_val,
                    fake_label_val, is_disc, loss_weight)


def gan_feat_loss(pred_fake, pred_real, criterion: str = "l1",
                  loss_weight: float = 1.0, reduction: str = "mean"):
    """Feature-matching loss (reference losses.py:460-492): ``pred_fake``
    and ``pred_real`` are per-discriminator lists of per-layer feature
    lists; the last entry of each (the final prediction) is excluded.
    ``pred_real`` features are treated as constants (the reference
    detaches them)."""
    if criterion == "l1":
        op = l1_loss
    elif criterion == "l2":
        op = mse_loss
    elif criterion == "charbonnier":
        op = charbonnier_loss
    else:
        raise ValueError(
            f"Unsupported loss mode: {criterion}. Supported ones are: "
            "l1|l2|charbonnier"
        )
    num_d = len(pred_fake)
    loss = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):
            real_const = jax.lax.stop_gradient(pred_real[i][j])
            # the reference applies loss_weight inside the criterion AND
            # multiplies the total by it again (losses.py:470-492) — that
            # double application is the published behavior, so keep it
            loss = loss + op(pred_fake[i][j], real_const,
                             loss_weight=loss_weight,
                             reduction=reduction) / num_d
    return loss * loss_weight


def g_path_regularize(path_grad, mean_path_length, decay: float = 0.01):
    """StyleGAN2 path-length regularizer (reference losses.py:409-419),
    given ``path_grad`` = d((fake*noise).sum())/d(latents) with shape
    (B, n_latents, latent_dim) — JAX computes gradients outside the loss.
    Returns (path_penalty, path_lengths_mean, updated_mean_path_length)."""
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(path_grad**2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    path_penalty = jnp.mean((path_lengths - jax.lax.stop_gradient(path_mean)) ** 2)
    return (
        path_penalty,
        jax.lax.stop_gradient(jnp.mean(path_lengths)),
        jax.lax.stop_gradient(path_mean),
    )


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
    "GANLoss": gan_loss,
    "MultiScaleGANLoss": multi_scale_gan_loss,
    "GANFeatLoss": gan_feat_loss,
}


def build_loss(opt: dict):
    """Build a loss closure from a BasicSR-style loss opt dict.

    Mirrors the reference's ``build_loss`` registry dispatch
    (basicsr/losses/__init__.py): ``type`` selects the loss, the remaining
    keys become keyword arguments. GAN losses (``GANLoss``,
    ``MultiScaleGANLoss``) yield closures called as
    ``loss(pred, target_is_real, is_disc=...)``; ``GANFeatLoss`` as
    ``loss(pred_fake, pred_real)``."""
    import inspect

    opt = dict(opt)
    fn = LOSS_REGISTRY[opt.pop("type")]
    accepted = set(inspect.signature(fn).parameters)
    unknown = set(opt) - accepted
    if unknown:
        raise ValueError(f"unknown option keys for {fn.__name__}: {sorted(unknown)}")
    return partial(fn, **{k: v for k, v in opt.items() if k in accepted})
