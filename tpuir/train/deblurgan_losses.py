"""DeblurGANv2 training losses (content + adversarial) and ImagePool.

Functional JAX port of /root/reference/src/deblurganv2/models/losses.py and
util/image_pool.py. Discriminators are passed as ``(apply_fn, params)``
pairs; every ``get_loss``/``get_g_loss`` returns a scalar float32 jnp value
(differentiable — wrap in jax.grad against the relevant params). The
relativistic variants keep their prediction pools on the host (numpy),
exactly like the reference's torch ImagePool of detached predictions —
so to jit a ragan/ragan-ls step, pass the host-computed pool means in as
``fake_mean``/``real_mean`` and call ``update_pools`` after the step (see
the RelativisticDiscLoss docstring); without explicit means those two
losses are eager-only.

Config surface mirrors ``get_loss(model)`` (losses.py:279-300):
content_loss in {'perceptual', 'l1'}, disc_loss in
{'wgan-gp', 'lsgan', 'gan', 'ragan', 'ragan-ls'}.
"""

from __future__ import annotations

import random
from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuir.train.vgg_features import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    VGG19Conv33,
)


class ImagePool:
    """util/image_pool.py:8-33 — a deque of detached tensors; ``query``
    samples up to pool_size of them (host-side, numpy)."""

    def __init__(self, pool_size: int = 50):
        self.pool_size = pool_size
        self.sample_size = pool_size
        self.images: deque = deque()

    def add(self, images):
        if self.pool_size == 0:
            return images
        for image in np.asarray(images):
            if len(self.images) >= self.pool_size:
                self.images.popleft()
            self.images.append(image[None])

    def query(self) -> np.ndarray:
        if len(self.images) > self.sample_size:
            imgs = random.sample(list(self.images), self.sample_size)
        else:
            imgs = list(self.images)
        return np.concatenate(imgs, 0)


# ---------------------------------------------------------------------------
# content losses
# ---------------------------------------------------------------------------


class ContentLoss:
    """losses.py:15-23 with the factory's L1 criterion (losses.py:283-285)."""

    def __call__(self, fake, real):
        return jnp.mean(jnp.abs(fake - real))


class PerceptualLoss:
    """losses.py:26-59: VGG19 conv3_3 MSE (x0.006) + pixel MSE (x0.5).

    Inputs are generator-space [-1, 1]. The reference maps to [0, 1] and
    then ImageNet-normalizes ONLY batch element 0 in place
    (losses.py:49-50 — ``fakeIm[0] = transform(fakeIm[0])``), so both the
    feature pass and the pixel-MSE see that partially-normalized tensor;
    we reproduce the exact semantics. f_real is stop-gradiented
    (``detach``, losses.py:53).
    """

    def __init__(self, vgg_params):
        self._vgg = VGG19Conv33()
        self._params = vgg_params

    def _prep(self, im):
        im = (im + 1.0) / 2.0
        el0 = (im[0] - IMAGENET_MEAN) / IMAGENET_STD
        return jnp.concatenate([el0[None], im[1:]], axis=0)

    def __call__(self, fake, real):
        fake = self._prep(fake)
        real = self._prep(real)
        f_fake = self._vgg.apply(self._params, fake)
        f_real = jax.lax.stop_gradient(self._vgg.apply(self._params, real))
        return 0.006 * jnp.mean((f_fake - f_real) ** 2) + 0.5 * jnp.mean(
            (fake - real) ** 2
        )


# ---------------------------------------------------------------------------
# adversarial losses
# ---------------------------------------------------------------------------


def _gan_criterion(pred, target: float, use_l1: bool):
    """losses.py:62-95: L1-to-label ('use_l1') or BCE-with-logits."""
    t = jnp.full_like(pred, target)
    if use_l1:
        return jnp.mean(jnp.abs(pred - t))
    return jnp.mean(
        jnp.maximum(pred, 0.0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


class DiscLoss:
    """Vanilla GAN (losses.py:98-129). BCE criterion."""

    use_l1 = False

    def get_g_loss(self, d_apply, d_params, fakeB, realB):
        return _gan_criterion(d_apply(d_params, fakeB), 1.0, self.use_l1)

    def get_loss(self, d_apply, d_params, fakeB, realB):
        loss_fake = _gan_criterion(
            d_apply(d_params, jax.lax.stop_gradient(fakeB)), 0.0, self.use_l1
        )
        loss_real = _gan_criterion(d_apply(d_params, realB), 1.0, self.use_l1)
        return (loss_fake + loss_real) * 0.5

    def __call__(self, d_apply, d_params, fakeB, realB):
        return self.get_loss(d_apply, d_params, fakeB, realB)


class DiscLossLS(DiscLoss):
    """LSGAN (losses.py:218-229): L1 criterion against the labels."""

    use_l1 = True


class DiscLossWGANGP(DiscLossLS):
    """WGAN-GP (losses.py:232-276), the released configs' default.
    The gradient penalty keeps the reference's single shared interpolation
    coefficient per call and its per-position channel-norm
    (``gradients.norm(2, dim=1)``, losses.py:269)."""

    LAMBDA = 10.0

    def get_g_loss(self, d_apply, d_params, fakeB, realB):
        return -jnp.mean(d_apply(d_params, fakeB))

    def calc_gradient_penalty(self, d_apply, d_params, real, fake, rng,
                              alpha: Optional[float] = None):
        if alpha is None:
            alpha = jax.random.uniform(rng, (1, 1, 1, 1))
        interp = alpha * real + (1.0 - alpha) * fake

        def d_sum(x):
            return jnp.sum(d_apply(d_params, x))

        grads = jax.grad(d_sum)(interp)
        gnorm = jnp.sqrt(jnp.sum(grads**2, axis=-1) + 1e-16)  # channel norm
        return jnp.mean((gnorm - 1.0) ** 2) * self.LAMBDA

    def get_loss(self, d_apply, d_params, fakeB, realB,
                 rng: Optional[jax.Array] = None):
        fakeB = jax.lax.stop_gradient(fakeB)
        wass = jnp.mean(d_apply(d_params, fakeB)) - jnp.mean(
            d_apply(d_params, realB)
        )
        if rng is None:
            rng = jax.random.PRNGKey(0)
        gp = self.calc_gradient_penalty(d_apply, d_params, realB, fakeB, rng)
        return wass + gp

    def __call__(self, d_apply, d_params, fakeB, realB, rng=None):
        return self.get_loss(d_apply, d_params, fakeB, realB, rng)


class RelativisticDiscLoss:
    """RaGAN (losses.py:132-173): predictions are centered on the running
    mean of the opposite pool.

    The pools are host-side numpy state (exactly like the reference's
    torch ImagePool of detached predictions), so the default
    ``get_loss``/``get_g_loss`` path — which reads AND updates them — is
    **eager-only**: calling it under ``jax.jit``/``jax.grad`` would
    np.asarray a tracer. To use these losses inside a jitted train step,
    compute the pool means host-side first and pass them in explicitly
    (``fake_mean=…, real_mean=…``) — that skips the in-step pool update;
    call ``update_pools`` yourself after the step.
    """

    use_l1 = False

    def __init__(self, pool_size: int = 50):
        self.fake_pool = ImagePool(pool_size)
        self.real_pool = ImagePool(pool_size)

    def pool_means(self):
        """Host-side (fake_mean, real_mean) — compute OUTSIDE jit and pass
        into get_loss/get_g_loss when the step is jitted."""
        f = self.fake_pool.query()
        r = self.real_pool.query()
        fm = jnp.float32(f.mean()) if f.size else jnp.float32(0.0)
        rm = jnp.float32(r.mean()) if r.size else jnp.float32(0.0)
        return fm, rm

    _pool_means = pool_means  # original (private) name, kept for callers

    def update_pools(self, d_apply, d_params, fakeB, realB):
        self.fake_pool.add(d_apply(d_params, jax.lax.stop_gradient(fakeB)))
        self.real_pool.add(d_apply(d_params, realB))

    def get_g_loss(self, d_apply, d_params, fakeB, realB,
                   fake_mean=None, real_mean=None):
        pred_fake = d_apply(d_params, fakeB)
        pred_real = d_apply(d_params, realB)
        if fake_mean is None or real_mean is None:
            fake_mean, real_mean = self.pool_means()
        return (
            _gan_criterion(pred_real - fake_mean, 0.0, self.use_l1)
            + _gan_criterion(pred_fake - real_mean, 1.0, self.use_l1)
        ) / 2.0

    def get_loss(self, d_apply, d_params, fakeB, realB,
                 fake_mean=None, real_mean=None):
        fakeB = jax.lax.stop_gradient(fakeB)
        explicit = fake_mean is not None and real_mean is not None
        if not explicit:
            self.update_pools(d_apply, d_params, fakeB, realB)
        pred_fake = d_apply(d_params, fakeB)
        pred_real = d_apply(d_params, realB)
        if not explicit:
            fake_mean, real_mean = self.pool_means()
        return (
            _gan_criterion(pred_real - fake_mean, 1.0, self.use_l1)
            + _gan_criterion(pred_fake - real_mean, 0.0, self.use_l1)
        ) / 2.0

    def __call__(self, d_apply, d_params, fakeB, realB, **kw):
        return self.get_loss(d_apply, d_params, fakeB, realB, **kw)


class RelativisticDiscLossLS(RelativisticDiscLoss):
    """RaLSGAN (losses.py:175-215): squared distance to ±1 around the
    opposite pool's mean. Same jit contract as RelativisticDiscLoss."""

    def get_g_loss(self, d_apply, d_params, fakeB, realB,
                   fake_mean=None, real_mean=None):
        pred_fake = d_apply(d_params, fakeB)
        pred_real = d_apply(d_params, realB)
        if fake_mean is None or real_mean is None:
            fake_mean, real_mean = self.pool_means()
        return (
            jnp.mean((pred_real - fake_mean + 1.0) ** 2)
            + jnp.mean((pred_fake - real_mean - 1.0) ** 2)
        ) / 2.0

    def get_loss(self, d_apply, d_params, fakeB, realB,
                 fake_mean=None, real_mean=None):
        fakeB = jax.lax.stop_gradient(fakeB)
        explicit = fake_mean is not None and real_mean is not None
        if not explicit:
            self.update_pools(d_apply, d_params, fakeB, realB)
        pred_fake = d_apply(d_params, fakeB)
        pred_real = d_apply(d_params, realB)
        if not explicit:
            fake_mean, real_mean = self.pool_means()
        return (
            jnp.mean((pred_real - fake_mean - 1.0) ** 2)
            + jnp.mean((pred_fake - real_mean + 1.0) ** 2)
        ) / 2.0


def get_loss(model_config: dict, vgg_params=None):
    """losses.py:279-300 — (content_loss, disc_loss) from the model config.
    ``vgg_params`` (converted torchvision VGG19) is required for
    'perceptual'."""
    cl = model_config["content_loss"]
    if cl == "perceptual":
        if vgg_params is None:
            raise ValueError(
                "content_loss='perceptual' needs converted VGG19 weights "
                "(tpuir.train.vgg_features.convert_vgg19_features)"
            )
        content: Callable = PerceptualLoss(vgg_params)
    elif cl == "l1":
        content = ContentLoss()
    else:
        raise ValueError(f"ContentLoss [{cl}] not recognized.")

    dl = model_config["disc_loss"]
    if dl == "wgan-gp":
        disc = DiscLossWGANGP()
    elif dl == "lsgan":
        disc = DiscLossLS()
    elif dl == "gan":
        disc = DiscLoss()
    elif dl == "ragan":
        disc = RelativisticDiscLoss()
    elif dl == "ragan-ls":
        disc = RelativisticDiscLossLS()
    else:
        raise ValueError(f"GAN Loss [{dl}] not recognized.")
    return content, disc
