"""UNet in pure-functional JAX (reference: model.py:121-193).

4-stage encoder/decoder with skip concats; conv_block = 2x(Conv3x3 + BN +
ReLU) (model.py:121-129); maxpool 2x2 down (model.py:136); ConvTranspose
k=2,s=2 up (model.py:147); 512->1024 bottleneck (model.py:166); 1x1 head
(model.py:173).  Weights are N(0, 0.02) per the reference's
initialize_weights regime (model.py:277-280, applied at train.py:45);
biases keep torch defaults.

BatchNorm running statistics are threaded explicitly: ``unet_apply`` returns
``(out, new_state)``.  Plain XLA convs — no Pallas needed here; this
architecture is secondary to the ConvLSTM.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from nasa_niswan_tpu.models.init import (
    normal_002_init,
    torch_conv_init,
    torch_conv_transpose_init,
)
from nasa_niswan_tpu.ops.conv import batch_norm, conv2d, conv2d_transpose, max_pool2d

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 5
    out_channels: int = 1
    features: Tuple[int, ...] = (64, 128, 256, 512)


def _conv3x3_init(rng, in_ch, out_ch):
    w_rng, b_rng = jax.random.split(rng)
    _, b = torch_conv_init(b_rng, 3, 3, in_ch, out_ch, bias=True)
    return {"w": normal_002_init(w_rng, 3, 3, in_ch, out_ch), "b": b}


def _bn_init(ch):
    params = {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}
    state = {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}
    return params, state


def _block_init(rng, in_ch, out_ch):
    r1, r2 = jax.random.split(rng)
    bn1_p, bn1_s = _bn_init(out_ch)
    bn2_p, bn2_s = _bn_init(out_ch)
    params = {
        "conv1": _conv3x3_init(r1, in_ch, out_ch),
        "bn1": bn1_p,
        "conv2": _conv3x3_init(r2, out_ch, out_ch),
        "bn2": bn2_p,
    }
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def _block_apply(p, s, x, training):
    x = conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1)
    x, bn1 = batch_norm(
        x, p["bn1"]["scale"], p["bn1"]["bias"], s["bn1"]["mean"], s["bn1"]["var"],
        training=training,
    )
    x = jax.nn.relu(x)
    x = conv2d(x, p["conv2"]["w"], p["conv2"]["b"], padding=1)
    x, bn2 = batch_norm(
        x, p["bn2"]["scale"], p["bn2"]["bias"], s["bn2"]["mean"], s["bn2"]["var"],
        training=training,
    )
    x = jax.nn.relu(x)
    return x, {"bn1": {"mean": bn1[0], "var": bn1[1]}, "bn2": {"mean": bn2[0], "var": bn2[1]}}


def unet_init(rng: jax.Array, config: UNetConfig) -> Tuple[Params, Params]:
    """Returns (params, state) where state holds BatchNorm running stats."""
    f = config.features
    params: Params = {}
    state: Params = {}
    rngs = jax.random.split(rng, 11)
    chans = [(config.in_channels, f[0]), (f[0], f[1]), (f[1], f[2]), (f[2], f[3])]
    for i, (ci, co) in enumerate(chans, 1):
        params[f"enc{i}"], state[f"enc{i}"] = _block_init(rngs[i - 1], ci, co)
    params["bottleneck"], state["bottleneck"] = _block_init(rngs[4], f[3], 2 * f[3])

    up_chans = [(2 * f[3], f[3]), (f[3], f[2]), (f[2], f[1]), (f[1], f[0])]
    for i, (ci, co) in enumerate(up_chans):
        name = f"dec{4 - i}"
        r_up, r_blk = jax.random.split(rngs[5 + i])
        w_rng, b_rng = jax.random.split(r_up)
        _, up_b = torch_conv_transpose_init(b_rng, 2, 2, ci, co, bias=True)
        # transpose-conv kernel layout (kh, kw, out, in): see ops.conv2d_transpose
        params[name] = {
            "up": {"w": normal_002_init(w_rng, 2, 2, co, ci), "b": up_b},
        }
        params[name]["block"], state[name] = _block_init(r_blk, ci, co)

    w_rng, b_rng = jax.random.split(rngs[9])
    _, head_b = torch_conv_init(b_rng, 1, 1, f[0], config.out_channels, bias=True)
    params["head"] = {
        "w": normal_002_init(w_rng, 1, 1, f[0], config.out_channels),
        "b": head_b,
    }
    return params, state


def unet_apply(
    params: Params, state: Params, x: jnp.ndarray, *, training: bool = False
) -> Tuple[jnp.ndarray, Params]:
    """x: (B, H, W, C) NHWC.  Returns (out (B, H, W, out_ch), new_state)."""
    new_state: Params = {}
    skips = []
    h = x
    for i in range(1, 5):
        h, new_state[f"enc{i}"] = _block_apply(
            params[f"enc{i}"], state[f"enc{i}"], h, training
        )
        skips.append(h)
        h = max_pool2d(h)
    h, new_state["bottleneck"] = _block_apply(
        params["bottleneck"], state["bottleneck"], h, training
    )
    for i, skip in zip(range(4, 0, -1), reversed(skips)):
        name = f"dec{i}"
        h = conv2d_transpose(
            h, params[name]["up"]["w"], params[name]["up"]["b"], stride=2, padding=0
        )
        h = jnp.concatenate([h, skip], axis=-1)  # (up, skip) order: model.py:152
        h, new_state[name] = _block_apply(
            params[name]["block"], state[name], h, training
        )
    out = conv2d(h, params["head"]["w"], params["head"]["b"])
    return out, new_state
