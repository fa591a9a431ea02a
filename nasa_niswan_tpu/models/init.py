"""Parameter initializers matching the reference's PyTorch initialization.

Two regimes exist upstream:
  * ConvLSTM keeps torch's *default* Conv2d init — U(+-1/sqrt(fan_in)) for
    weight and bias (initialize_weights is never applied to it; train.py:48).
  * UNet / pix2pix weights are overwritten with N(0, 0.02)
    (model.py:277-280, applied at train.py:39,45); biases keep the default.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def torch_conv_init(
    rng: jax.Array,
    kh: int,
    kw: int,
    in_ch: int,
    out_ch: int,
    *,
    bias: bool = True,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)),
    fan_in = in_ch * kh * kw; bias likewise.  Kernel layout HWIO."""
    k_rng, b_rng = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_ch * kh * kw)
    kernel = jax.random.uniform(
        k_rng, (kh, kw, in_ch, out_ch), dtype, minval=-bound, maxval=bound
    )
    b = (
        jax.random.uniform(b_rng, (out_ch,), dtype, minval=-bound, maxval=bound)
        if bias
        else None
    )
    return kernel, b


def torch_conv_transpose_init(
    rng: jax.Array,
    kh: int,
    kw: int,
    in_ch: int,
    out_ch: int,
    *,
    bias: bool = True,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """torch ConvTranspose2d default: weight dim 1 is out_ch, so torch's
    fan_in = out_ch * kh * kw.  Kernel layout (kh, kw, out_ch, in_ch) as
    consumed by ops.conv2d_transpose."""
    k_rng, b_rng = jax.random.split(rng)
    bound = 1.0 / math.sqrt(out_ch * kh * kw)
    kernel = jax.random.uniform(
        k_rng, (kh, kw, out_ch, in_ch), dtype, minval=-bound, maxval=bound
    )
    b = (
        jax.random.uniform(b_rng, (out_ch,), dtype, minval=-bound, maxval=bound)
        if bias
        else None
    )
    return kernel, b


def normal_002_init(
    rng: jax.Array, kh: int, kw: int, in_ch: int, out_ch: int, *, dtype=jnp.float32
) -> jnp.ndarray:
    """N(0, 0.02) weight init, the pix2pix/UNet regime (model.py:277-280)."""
    return 0.02 * jax.random.normal(rng, (kh, kw, in_ch, out_ch), dtype)
