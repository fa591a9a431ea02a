"""Determinism helpers.

The reference seeds python/numpy/torch and forces cuDNN determinism
(utils.py:77-88).  Under JAX, compiled programs are deterministic by
construction; all randomness flows from explicit PRNG keys.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_rng(seed: int = 0) -> jax.Array:
    """Seed host-side RNGs and return the root jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
