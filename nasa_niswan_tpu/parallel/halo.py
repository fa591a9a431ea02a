"""Manual halo-exchange primitives for spatially sharded grids (shard_map).

The reference computes on a geophysically padded domain (e.g. 100x154 built
by cyclic-lon/reflective-lat padding, dataset.py:22-53) and every conv then
uses zero padding (model.py:204).  Under spatial sharding that decomposes
into two different jobs:

  * the geo pad itself is a one-time data rearrangement per step — it stays
    a plain jnp op (core/padding.pad_geo) and GSPMD lays it out across
    shards automatically;
  * the per-conv zero-padding halo is the hot communication: every ConvLSTM
    cell, every timestep, needs k//2 rows/cols from neighbor shards.  That
    is what this module hand-implements: ``halo_exchange_zero`` +
    ``sharded_conv2d`` reproduce the single-device conv bit-for-bit with one
    ring ppermute per axis per conv, and the two-phase order (lon first,
    then lat on the lon-extended tile) fills corner halos from diagonal
    neighbors without extra messages.

Run inside ``jax.shard_map`` over a ("dp", "lat", "lon") mesh
(parallel/mesh.py).  On TPU hardware the lon-axis ppermutes ride the ICI
ring — the globe's cyclic topology maps exactly onto the interconnect.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nasa_niswan_tpu.ops.conv import conv2d


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _ring_perm_rev(n: int):
    return [(i, (i - 1) % n) for i in range(n)]


def _shift_from_left(x, axis_name):
    """Each device receives its LEFT (lower-index) neighbor's data, cyclic."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return x
    return jax.lax.ppermute(x, axis_name, perm=_ring_perm(n))


def _shift_from_right(x, axis_name):
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return x
    return jax.lax.ppermute(x, axis_name, perm=_ring_perm_rev(n))


def _extend_axis(
    x: jnp.ndarray, pad: int, axis: int, axis_name: str, *, cyclic: bool
) -> jnp.ndarray:
    """Extend ``axis`` of a sharded array by ``pad`` halo slots per side from
    neighbor shards.  cyclic=False zeroes the halos at the domain-boundary
    shards (zero-padding semantics); cyclic=True wraps (ring topology)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    size = x.shape[axis]
    if pad > size:
        raise ValueError(f"halo {pad} exceeds local extent {size}")

    take_lo = jax.lax.slice_in_dim(x, 0, pad, axis=axis)
    take_hi = jax.lax.slice_in_dim(x, size - pad, size, axis=axis)

    if n == 1:
        lo_halo, hi_halo = take_hi, take_lo  # wraps to itself
    else:
        lo_halo = _shift_from_left(take_hi, axis_name)
        hi_halo = _shift_from_right(take_lo, axis_name)
    if not cyclic:
        lo_halo = jnp.where(idx == 0, 0.0, lo_halo)
        hi_halo = jnp.where(idx == n - 1, 0.0, hi_halo)
    return jnp.concatenate([lo_halo, x, hi_halo], axis=axis)


def halo_exchange_zero(
    x: jnp.ndarray,
    pad: int,
    *,
    lat_axis: int = 1,
    lon_axis: int = 2,
    lat_name: str = "lat",
    lon_name: str = "lon",
) -> jnp.ndarray:
    """(B, h, w, C) local tile -> (B, h+2p, w+2p, C): neighbor halos inside
    the domain, zeros beyond its edge.  Call inside shard_map."""
    x = _extend_axis(x, pad, lon_axis, lon_name, cyclic=False)
    return _extend_axis(x, pad, lat_axis, lat_name, cyclic=False)


def halo_exchange_geo(
    x: jnp.ndarray,
    pad: int,
    *,
    lat_axis: int = 1,
    lon_axis: int = 2,
    lat_name: str = "lat",
    lon_name: str = "lon",
) -> jnp.ndarray:
    """Geo-topology halos for padding-free spatial models: cyclic in
    longitude (ring), zero toward the poles.  (The reflective pole rows are
    a data-construction concern, not a conv halo — see module docstring.)"""
    x = _extend_axis(x, pad, lon_axis, lon_name, cyclic=True)
    return _extend_axis(x, pad, lat_axis, lat_name, cyclic=False)


def sharded_conv2d(
    x,
    kernel,
    bias=None,
    *,
    pad: int,
    lat_axis: int = 1,
    lon_axis: int = 2,
    lat_name: str = "lat",
    lon_name: str = "lon",
):
    """Conv with SAME zero padding on a spatially sharded NHWC tile —
    bit-identical to single-device conv2d(padding=pad).  Inside shard_map."""
    if pad:
        x = halo_exchange_zero(
            x, pad, lat_axis=lat_axis, lon_axis=lon_axis,
            lat_name=lat_name, lon_name=lon_name,
        )
    return conv2d(x, kernel, bias, padding=0)
