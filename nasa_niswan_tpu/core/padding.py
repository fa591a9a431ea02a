"""Geophysically-correct padding for global lat-lon fields.

The globe wraps in longitude and mirrors at the poles, so a conv-friendly
padded field is built from (reference semantics: dataset.py:22-53):

  1. cyclic padding along longitude   -- wrap-around copy of the far side
  2. reflective padding along latitude -- mirror about the pole row,
     *excluding* the boundary row itself (rows 1..p flipped on top,
     rows H-1-p..H-2 flipped at the bottom)

These are pure jnp functions traceable under jit; the sharded form (halo
exchange over a device mesh via ppermute) lives in
``nasa_niswan_tpu.parallel.halo``.

Layout convention: the last two axes are (lat, lon); any leading axes
(batch, time, channel, level) are untouched.

Reference-parity notes:
  * The reference's 4-D sequence variant (dataset.py:96) calls np.fliplr on a
    (T, C, H, W) array, which flips the *channel* axis instead of latitude —
    a latent bug in the upstream RNN data path. We implement the intended
    latitude mirror; ``quirk_channel_flip=True`` reproduces the upstream
    behavior bit-for-bit for parity testing.
  * The reference's cyclic pad uses ``data[..., -pad_left:]`` which returns
    the *whole* array when pad_left == 0 (never exercised upstream because
    the canonical padding is (100, 154)); we use explicit slice bounds so a
    zero pad is a no-op.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _split_pad(total: int, current: int) -> Tuple[int, int]:
    """Symmetric split of (total - current): reference dataset.py:27-28,42-43."""
    first = (total - current) // 2
    second = total - current - first
    return first, second


def pad_cyclic_lon(x: jnp.ndarray, target_lon: int) -> jnp.ndarray:
    """Cyclically extend the longitude (last) axis to ``target_lon`` columns.

    Matches reference dataset.py:22-35: left pad takes the last ``pad_left``
    columns, right pad takes the first ``pad_right`` columns.
    """
    w = x.shape[-1]
    pad_left, pad_right = _split_pad(target_lon, w)
    if pad_left < 0 or pad_right < 0:
        raise ValueError(f"target_lon={target_lon} smaller than lon size {w}")
    if pad_left > w or pad_right > w:
        raise ValueError(
            f"requested lon padding ({pad_left},{pad_right}) exceeds lon size {w}"
        )
    parts = []
    if pad_left:
        parts.append(x[..., w - pad_left :])
    parts.append(x)
    if pad_right:
        parts.append(x[..., :pad_right])
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x


def pad_reflect_lat(
    x: jnp.ndarray,
    target_lat: int,
    *,
    quirk_channel_flip: bool = False,
) -> jnp.ndarray:
    """Reflect the latitude (second-to-last) axis to ``target_lat`` rows.

    The mirror excludes the boundary row itself: with pad p, the rows added
    above row 0 are rows p..1 (in that order), and the rows added below row
    H-1 are rows H-2..H-1-p (reference dataset.py:37-53 — note the
    ``pad += 1`` then ``[1:pad]`` / ``[-pad:-1]`` slicing).

    ``quirk_channel_flip`` reproduces the upstream 4-D bug where axis 1 of
    the full array (the channel axis of a (T, C, H, W) input) is flipped
    instead of latitude (dataset.py:96).
    """
    h = x.shape[-2]
    pad_top, pad_bottom = _split_pad(target_lat, h)
    if pad_top < 0 or pad_bottom < 0:
        raise ValueError(f"target_lat={target_lat} smaller than lat size {h}")
    if pad_top >= h or pad_bottom >= h:
        raise ValueError(
            f"requested lat padding ({pad_top},{pad_bottom}) exceeds lat size {h}"
        )

    def _mirror(block: jnp.ndarray) -> jnp.ndarray:
        if quirk_channel_flip and x.ndim >= 4:
            return jnp.flip(block, axis=1)
        return jnp.flip(block, axis=-2)

    parts = []
    if pad_top:
        parts.append(_mirror(x[..., 1 : 1 + pad_top, :]))
    parts.append(x)
    if pad_bottom:
        parts.append(_mirror(x[..., h - 1 - pad_bottom : h - 1, :]))
    return jnp.concatenate(parts, axis=-2) if len(parts) > 1 else x


def pad_geo(
    x: jnp.ndarray,
    target_shape: Tuple[int, int],
    *,
    quirk_channel_flip: bool = False,
) -> jnp.ndarray:
    """Full geophysical pad: cyclic longitude then reflective latitude.

    ``target_shape`` is (padded_lat, padded_lon); matches the reference's
    ``_padding_data`` order (dataset.py:55-58).
    """
    x = pad_cyclic_lon(x, target_shape[1])
    return pad_reflect_lat(x, target_shape[0], quirk_channel_flip=quirk_channel_flip)


def crop_to_grid(
    x: jnp.ndarray, grid_shape: Tuple[int, int], offsets: Tuple[int, int] | None = None
) -> jnp.ndarray:
    """Crop the last two axes back to the physical grid.

    With default offsets, inverts ``pad_geo``: offset = (padded - grid) // 2,
    matching the training-time crops (train.py:99-102).
    """
    h, w = grid_shape
    if offsets is None:
        offsets = ((x.shape[-2] - h) // 2, (x.shape[-1] - w) // 2)
    oh, ow = offsets
    return x[..., oh : oh + h, ow : ow + w]
