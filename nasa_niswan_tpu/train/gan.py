"""Adversarial (pix2pix) training — the capability the reference defines
but never wires up.

The reference ships a PatchGAN Discriminator (model.py:20-45) yet its
training loop optimizes the Generator alone with MSE+L1 (train.py:35-39,
105).  This module provides the full conditional-GAN objective for users
who want it (standard pix2pix: BCE-with-logits adversarial loss + λ·L1),
as one jitted step updating both networks.

G loss = BCE(D(x, G(x)), 1) + lambda_l1 * L1(y, G(x))
D loss = 0.5 * [BCE(D(x, y), 1) + BCE(D(x, G(x)), 0)]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from nasa_niswan_tpu.models.pix2pix import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_apply,
    generator_apply,
)


def bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Mean binary cross-entropy on raw logits (torch BCEWithLogitsLoss)."""
    t = jnp.full_like(logits, target)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def make_gan_train_step(
    g_cfg: GeneratorConfig,
    d_cfg: DiscriminatorConfig,
    g_optimizer,
    d_optimizer,
    *,
    lambda_l1: float = 100.0,
):
    """Jitted joint step: (g_params, d_params, g_opt, d_opt, x, y, rng) ->
    updated states + {g_loss, d_loss, l1}.  x, y are NHWC; y has the
    discriminator's in_channels."""

    def d_loss_fn(d_params, g_params, x, y, rng):
        fake = generator_apply(g_params, x, training=True, dropout_rng=rng)
        real_logits = discriminator_apply(d_params, y, y_cond(x), d_cfg)
        fake_logits = discriminator_apply(
            d_params, jax.lax.stop_gradient(fake), y_cond(x), d_cfg
        )
        return 0.5 * (
            bce_with_logits(real_logits, 1.0) + bce_with_logits(fake_logits, 0.0)
        )

    def y_cond(x):
        # condition the patch discriminator on the first target-channel-many
        # input channels (x||y pairing, model.py:44)
        return x[..., : d_cfg.in_channels]

    def g_loss_fn(g_params, d_params, x, y, rng):
        fake = generator_apply(g_params, x, training=True, dropout_rng=rng)
        fake_logits = discriminator_apply(d_params, fake, y_cond(x), d_cfg)
        adv = bce_with_logits(fake_logits, 1.0)
        l1 = jnp.mean(jnp.abs(y - fake))
        return adv + lambda_l1 * l1, l1

    @jax.jit
    def step(g_params, d_params, g_opt, d_opt, x, y, rng):
        d_rng, g_rng = jax.random.split(rng)
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            d_params, g_params, x, y, d_rng
        )
        d_updates, d_opt = d_optimizer.update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        (g_loss, l1), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_params, d_params, x, y, g_rng
        )
        g_updates, g_opt = g_optimizer.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        return (
            g_params,
            d_params,
            g_opt,
            d_opt,
            {"g_loss": g_loss, "d_loss": d_loss, "l1": l1},
        )

    return step
