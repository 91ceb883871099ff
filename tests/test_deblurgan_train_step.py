"""End-to-end DeblurGANv2 adversarial train step on tiny shapes: generator
(FPN-MobileNet) + double_gan discriminators + wgan-gp/perceptual-free losses
optimized with optax, mirroring the reference's G/D alternation
(adv_lambda-weighted content + adversarial G loss; D trained on detached
fakes — config/config.yaml model section)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpuir.models.deblurgan import discriminators as jd
from tpuir.train import deblurgan_losses as jl


def test_double_gan_train_step_improves_losses():
    from tpuir.models.deblurgan.resnet_gen import ResnetGenerator

    gen = ResnetGenerator(ngf=8, n_blocks=1)
    cfg = {"d_name": "double_gan", "d_layers": 3, "norm_layer": "instance",
           "content_loss": "l1", "disc_loss": "wgan-gp", "adv_lambda": 0.001}
    discs = jd.get_discriminator(cfg)
    content, disc_loss = jl.get_loss(cfg)

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 32, 32, 3), jnp.float32) * 2 - 1
    y = jnp.clip(x + 0.1, -1, 1)

    gp = gen.init(jax.random.PRNGKey(1), x)
    dps = {k: m.init(jax.random.PRNGKey(2 + i), x)
           for i, (k, m) in enumerate(discs.items())}

    g_opt = optax.adam(1e-3)
    d_opt = optax.adam(1e-3)
    g_state = g_opt.init(gp)
    d_state = d_opt.init(dps)

    def d_apply_patch(p, img):
        return discs["patch"].apply(p, img)

    def d_apply_full(p, img):
        return discs["full"].apply(p, img)

    @jax.jit
    def d_step(dps, d_state, gp, x, y, rng):
        fake = gen.apply(gp, x)

        def loss_fn(dps):
            l_p = disc_loss.get_loss(d_apply_patch, dps["patch"], fake, y, rng)
            l_f = disc_loss.get_loss(d_apply_full, dps["full"], fake, y, rng)
            return 0.5 * (l_p + l_f)

        ld, grads = jax.value_and_grad(loss_fn)(dps)
        updates, d_state = d_opt.update(grads, d_state)
        return optax.apply_updates(dps, updates), d_state, ld

    @jax.jit
    def g_step(gp, g_state, dps, x, y):
        def loss_fn(gp):
            fake = gen.apply(gp, x)
            adv = 0.5 * (
                disc_loss.get_g_loss(d_apply_patch, dps["patch"], fake, y)
                + disc_loss.get_g_loss(d_apply_full, dps["full"], fake, y)
            )
            return content(fake, y) + cfg["adv_lambda"] * adv

        lg, grads = jax.value_and_grad(loss_fn)(gp)
        updates, g_state = g_opt.update(grads, g_state)
        return optax.apply_updates(gp, updates), g_state, lg

    g_losses = []
    for step in range(4):
        dps, d_state, ld = d_step(dps, d_state, gp, x, y,
                                  jax.random.fold_in(rng, step))
        gp, g_state, lg = g_step(gp, g_state, dps, x, y)
        assert np.isfinite(float(ld)) and np.isfinite(float(lg))
        g_losses.append(float(lg))
    assert g_losses[-1] < g_losses[0]  # content term dominates and shrinks


def test_multiscale_gan_grads_flow():
    cfg = {"d_name": "multi_scale", "norm_layer": "instance"}
    disc = jd.get_discriminator(cfg)["multi_scale"]
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    p = disc.init(jax.random.PRNGKey(1), x)
    from tpuir.train.losses import multi_scale_gan_loss

    def loss_fn(p):
        return multi_scale_gan_loss(disc.apply(p, x), True, "lsgan")

    g = jax.grad(loss_fn)(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(v)) for v in leaves)
    assert any(float(jnp.abs(v).max()) > 0 for v in leaves)
