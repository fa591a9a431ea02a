"""Convolution / normalization primitives in TPU-native NHWC layout.

All functions are pure: parameters are explicit pytrees, activations flow
NHWC (channels on the 128-lane axis, the layout XLA:TPU tiles best).  These
back the model zoo in ``nasa_niswan_tpu.models``; behavioral contracts cite
the reference modules they re-implement.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# NHWC activations, HWIO kernels.
_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int | Tuple[int, int] = 1,
    padding: str | int | Tuple[int, int] = 0,
    pad_mode: str = "zeros",
    preferred_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """2-D convolution (cross-correlation, torch semantics) over NHWC input.

    ``padding``: int p means p rows/cols of padding on each side (torch
    Conv2d convention).  ``pad_mode='reflect'`` matches torch
    ``padding_mode='reflect'`` used by the pix2pix blocks (model.py:10,25).

    Output dtype follows the input dtype (preferred_dtype=None): on TPU the
    MXU still accumulates in f32 internally for bf16 inputs, and a
    same-dtype output keeps the conv's autodiff transpose type-consistent
    (an explicit f32 preferred_element_type breaks grad for bf16 inputs).
    Downstream f32 math (bias add, gate nonlinearities) upcasts naturally.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if (
        kernel.shape[0] == kernel.shape[1] == 1
        and stride == (1, 1)
        and padding in ((0, 0), "VALID", "SAME")
    ):
        # A 1x1 conv IS a channel matmul; XLA's conv_general lowering
        # brackets it with two layout copies per call on TPU (measured
        # ~0.015 ms/step on the serving scan's head tap — ~4% of the whole
        # step), while the einsum form lowers to a bare MXU matmul.
        out = jnp.einsum(
            "bhwc,co->bhwo",
            x,
            kernel[0, 0],
            preferred_element_type=preferred_dtype or x.dtype,
        )
        if bias is not None:
            out = out + bias
        return out
    if isinstance(padding, str):
        pad_arg = padding
    elif pad_mode == "zeros":
        pad_arg = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        # Materialize non-zero padding, then run a VALID conv.
        mode = {"reflect": "reflect", "circular": "wrap"}[pad_mode]
        x = jnp.pad(
            x,
            ((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)),
            mode=mode,
        )
        pad_arg = "VALID"
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=pad_arg,
        dimension_numbers=_DIMS,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def conv2d_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int | Tuple[int, int] = 2,
    padding: int = 0,
    preferred_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Transposed 2-D convolution matching torch ``ConvTranspose2d``.

    Kernel layout (kh, kw, out_ch, in_ch) — the HWIO layout of the
    *underlying forward conv* whose gradient this computes (torch
    ConvTranspose2d weight (in, out, kh, kw) maps via transpose(2, 3, 1, 0)).
    Output spatial size = (in - 1) * stride - 2 * padding + k.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    kh, kw = kernel.shape[0], kernel.shape[1]
    # torch padding p -> effective transposed-conv padding (k - 1 - p).
    pad = [(kh - 1 - padding, kh - 1 - padding), (kw - 1 - padding, kw - 1 - padding)]
    out = jax.lax.conv_transpose(
        x,
        kernel,
        strides=stride,
        padding=pad,
        dimension_numbers=_DIMS,
        transpose_kernel=True,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Max pool over NHWC spatial dims (torch MaxPool2d(k, s), no padding)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def instance_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    *,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """InstanceNorm2d: per-sample, per-channel normalization over (H, W).

    Matches torch ``InstanceNorm2d(affine=True)`` (model.py:12,57) — biased
    variance, no running stats.
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


def batch_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    *,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """BatchNorm2d with torch semantics (model.py:124,127 via conv_block).

    Returns (out, (new_running_mean, new_running_var)).  In training mode the
    batch statistics normalize and the running stats are updated with the
    *unbiased* batch variance (torch convention); in eval mode the running
    stats normalize and pass through unchanged.
    """
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    out = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return out, (new_mean, new_var)


def dropout2d(
    x: jnp.ndarray, rate: float, rng: Optional[jax.Array], *, training: bool
) -> jnp.ndarray:
    """Channel-wise dropout (torch Dropout2d, model.py:61): whole channels of
    each sample are zeroed with probability ``rate``; survivors scaled by
    1/(1-rate)."""
    if not training or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape=(x.shape[0], 1, 1, x.shape[3]))
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)
