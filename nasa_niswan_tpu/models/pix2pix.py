"""pix2pix Generator / PatchGAN Discriminator (reference: model.py:5-118).

The Generator is a 7-deep stride-2 U-Net with InstanceNorm, reflect-padded
4x4 convs, dropout on the first three decoder blocks, and an un-activated
final ConvTranspose (model.py:68-118).  The Discriminator is the 70x70
PatchGAN over concat(x, y) (model.py:20-45).  Note the reference training
loop never exercises the Discriminator — the PIX2PIX branch trains the
Generator alone with MSE+L1 (train.py:35-39,105) — but both are provided for
full adversarial training.

Weights N(0, 0.02) per initialize_weights (model.py:277-280, train.py:39);
conv biases (where present) keep torch defaults; InstanceNorm affine params
init to (1, 0).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nasa_niswan_tpu.models.init import normal_002_init, torch_conv_init, torch_conv_transpose_init
from nasa_niswan_tpu.ops.conv import (
    conv2d,
    conv2d_transpose,
    dropout2d,
    instance_norm,
    leaky_relu,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    in_channels: int = 5
    features: int = 64


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    in_channels: int = 1
    features: Tuple[int, ...] = (64, 128, 256, 512)


def _in_init(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _gblock_init(rng, in_ch, out_ch, encoder: bool):
    # conv bias=False in GBlocks (model.py:53-55); transpose kernels are
    # stored (kh, kw, out, in) per ops.conv2d_transpose.
    if encoder:
        w = normal_002_init(rng, 4, 4, in_ch, out_ch)
    else:
        w = normal_002_init(rng, 4, 4, out_ch, in_ch)
    return {"w": w, "norm": _in_init(out_ch)}


def _gblock_apply(p, x, *, encoder, act, dropout_rng=None, training=False):
    if encoder:
        x = conv2d(x, p["w"], stride=2, padding=1, pad_mode="reflect")
    else:
        x = conv2d_transpose(x, p["w"], stride=2, padding=1)
    x = instance_norm(x, p["norm"]["scale"], p["norm"]["bias"])
    x = jax.nn.relu(x) if act == "relu" else leaky_relu(x, 0.2)
    if dropout_rng is not None:
        x = dropout2d(x, 0.5, dropout_rng, training=training)
    return x


def generator_init(rng: jax.Array, config: GeneratorConfig) -> Params:
    f = config.features
    rngs = iter(jax.random.split(rng, 20))
    params: Params = {}

    w_rng, b_rng = jax.random.split(next(rngs))
    _, b = torch_conv_init(b_rng, 4, 4, config.in_channels, f, bias=True)
    params["initial"] = {"w": normal_002_init(w_rng, 4, 4, config.in_channels, f), "b": b}

    enc_chans = [(f, 2 * f), (2 * f, 4 * f), (4 * f, 8 * f)] + [(8 * f, 8 * f)] * 3
    for i, (ci, co) in enumerate(enc_chans, 1):
        params[f"enc{i}"] = _gblock_init(next(rngs), ci, co, encoder=True)

    w_rng, b_rng = jax.random.split(next(rngs))
    _, b = torch_conv_init(b_rng, 4, 4, 8 * f, 8 * f, bias=True)
    params["bottleneck"] = {"w": normal_002_init(w_rng, 4, 4, 8 * f, 8 * f), "b": b}

    dec_chans = [
        (8 * f, 8 * f),
        (16 * f, 8 * f),
        (16 * f, 8 * f),
        (16 * f, 8 * f),
        (16 * f, 4 * f),
        (8 * f, 2 * f),
        (4 * f, f),
    ]
    for i, (ci, co) in enumerate(dec_chans, 1):
        params[f"dec{i}"] = _gblock_init(next(rngs), ci, co, encoder=False)

    w_rng, b_rng = jax.random.split(next(rngs))
    _, b = torch_conv_transpose_init(b_rng, 4, 4, 2 * f, 1, bias=True)
    params["final"] = {"w": normal_002_init(w_rng, 4, 4, 1, 2 * f), "b": b}
    return params


def generator_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    training: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """x: (B, H, W, C) with H, W divisible by 256 (8 stride-2 stages).

    Dropout2d(0.5) is applied on decoder blocks 1-3 (model.py:89-91).  Note
    torch applies dropout in both train and eval mode for Dropout2d inside a
    module unless .eval() is called — we follow standard semantics: active
    only when ``training`` and a ``dropout_rng`` is given.
    """
    drop = (
        jax.random.split(dropout_rng, 3)
        if (training and dropout_rng is not None)
        else [None] * 3
    )
    e0 = leaky_relu(
        conv2d(x, params["initial"]["w"], params["initial"]["b"], stride=2, padding=1,
               pad_mode="reflect"),
        0.2,
    )
    encs = [e0]
    h = e0
    for i in range(1, 7):
        h = _gblock_apply(params[f"enc{i}"], h, encoder=True, act="leaky")
        encs.append(h)
    bn = leaky_relu(
        conv2d(h, params["bottleneck"]["w"], params["bottleneck"]["b"], stride=2,
               padding=1, pad_mode="reflect"),
        0.2,
    )
    h = _gblock_apply(
        params["dec1"], bn, encoder=False, act="relu", dropout_rng=drop[0],
        training=training,
    )
    for i in range(2, 8):
        skip = encs[8 - i]  # dec2<-enc6 ... dec7<-enc1 (model.py:112-117)
        h = jnp.concatenate([h, skip], axis=-1)
        h = _gblock_apply(
            params[f"dec{i}"], h, encoder=False, act="relu",
            dropout_rng=drop[i - 1] if i <= 3 else None, training=training,
        )
    h = jnp.concatenate([h, e0], axis=-1)
    return conv2d_transpose(h, params["final"]["w"], params["final"]["b"], stride=2,
                            padding=1)


def discriminator_init(rng: jax.Array, config: DiscriminatorConfig) -> Params:
    f = config.features
    rngs = iter(jax.random.split(rng, 8))
    params: Params = {}
    w_rng, b_rng = jax.random.split(next(rngs))
    _, b = torch_conv_init(b_rng, 4, 4, config.in_channels * 2, f[0], bias=True)
    params["initial"] = {
        "w": normal_002_init(w_rng, 4, 4, config.in_channels * 2, f[0]),
        "b": b,
    }
    in_ch = f[0]
    for i, feat in enumerate(f[1:], 1):
        params[f"block{i}"] = {
            "w": normal_002_init(next(rngs), 4, 4, in_ch, feat),
            "norm": _in_init(feat),
        }
        in_ch = feat
    w_rng, b_rng = jax.random.split(next(rngs))
    _, b = torch_conv_init(b_rng, 4, 4, in_ch, 1, bias=True)
    params["final"] = {"w": normal_002_init(w_rng, 4, 4, in_ch, 1), "b": b}
    return params


def discriminator_apply(
    params: Params, x: jnp.ndarray, y: jnp.ndarray, config: DiscriminatorConfig
) -> jnp.ndarray:
    """PatchGAN score map over concat(x, y) (model.py:43-45)."""
    f = config.features
    h = leaky_relu(
        conv2d(jnp.concatenate([x, y], axis=-1), params["initial"]["w"],
               params["initial"]["b"], stride=2, padding=1, pad_mode="reflect"),
        0.2,
    )
    for i, feat in enumerate(f[1:], 1):
        stride = 1 if feat == f[-1] else 2  # last DBlock stride 1 (model.py:33)
        p = params[f"block{i}"]
        h = conv2d(h, p["w"], stride=stride, padding=1, pad_mode="reflect")
        h = instance_norm(h, p["norm"]["scale"], p["norm"]["bias"])
        h = leaky_relu(h, 0.2)
    return conv2d(h, params["final"]["w"], params["final"]["b"], stride=1, padding=1,
                  pad_mode="reflect")
