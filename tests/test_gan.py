"""Adversarial pix2pix training step: both networks update, losses finite,
BCE matches torch BCEWithLogitsLoss."""

import jax
import numpy as np
import torch

from nasa_niswan_tpu.models.pix2pix import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_init,
    generator_init,
)
from nasa_niswan_tpu.train.gan import bce_with_logits, make_gan_train_step
from nasa_niswan_tpu.train.loop import make_optimizer


def test_bce_matches_torch(rng):
    logits = rng.standard_normal(200).astype(np.float32)
    for target in (0.0, 1.0):
        want = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.full((200,), target)
        ).item()
        got = float(bce_with_logits(np.asarray(logits), target))
        assert abs(got - want) < 1e-6


def test_gan_step_updates_both_networks(rng):
    g_cfg = GeneratorConfig(in_channels=2, features=4)
    d_cfg = DiscriminatorConfig(in_channels=1, features=(4, 8, 16, 32))
    g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
    d_params = discriminator_init(jax.random.PRNGKey(1), d_cfg)
    g_opt_t = make_optimizer(2e-4, (0.5, 0.999))
    d_opt_t = make_optimizer(2e-4, (0.5, 0.999))
    step = make_gan_train_step(g_cfg, d_cfg, g_opt_t, d_opt_t)

    x = rng.standard_normal((2, 128, 128, 2)).astype(np.float32)
    y = rng.standard_normal((2, 128, 128, 1)).astype(np.float32)
    g2, d2, _, _, metrics = step(
        g_params, d_params, g_opt_t.init(g_params), d_opt_t.init(d_params),
        x, y, jax.random.PRNGKey(2),
    )
    for k in ("g_loss", "d_loss", "l1"):
        assert np.isfinite(float(metrics[k]))
    # both parameter sets moved
    assert not np.allclose(
        np.asarray(g2["initial"]["w"]), np.asarray(g_params["initial"]["w"])
    )
    assert not np.allclose(
        np.asarray(d2["initial"]["w"]), np.asarray(d_params["initial"]["w"])
    )
