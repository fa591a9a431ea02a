"""Device-mesh construction and sharding helpers.

The canonical mesh for this framework is ("dp", "lat", "lon"):

  dp   data parallel over the batch — gradient allreduce (psum) over ICI
  lat  latitude rows of the global grid (spatial / tensor-parallel analog)
  lon  longitude columns — the cyclic axis; its collectives are ring
       ppermutes, the exact communication topology of a TPU ICI ring

The reference has no distributed code at all (SURVEY.md §2.5; bare .cuda()
at train.py:36,92-93) — this package is the new TPU-native capability.
Multi-host launch: call jax.distributed.initialize() before building the
mesh; jax.devices() then spans all hosts and each host feeds its own batch
shard (data/pipeline.device_prefetch with a NamedSharding).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("dp", "lat", "lon")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host initialization: call once per host before make_mesh.

    Wraps jax.distributed.initialize (env-autodetected on TPU pods when
    called with no arguments).  After this, jax.devices() spans all hosts;
    build the global mesh from it and feed each host its own batch shard.
    Returns the process index.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_mesh(
    dp: int = 1,
    lat: int = 1,
    lon: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, lat, lon) mesh over the given (or all) devices.

    Axis sizes must multiply to the device count.  On real hardware, pass
    devices ordered so that the lon axis maps to a physical ICI ring (the
    default device order on a TPU slice already does for the innermost axis).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = dp * lat * lon
    if n != len(devices):
        raise ValueError(
            f"mesh {dp}x{lat}x{lon}={n} != device count {len(devices)}"
        )
    arr = np.asarray(devices).reshape(dp, lat, lon)
    return Mesh(arr, MESH_AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Batch axis over dp only (host pipeline placement for raw batches)."""
    return NamedSharding(mesh, P("dp"))


def spatial_sharded(
    mesh: Mesh, *, ndim: int, lat_axis: int, lon_axis: int, batch_axis: int = 0
) -> NamedSharding:
    """Shard (batch, ..., lat, lon, ...) arrays over the full mesh."""
    spec = [None] * ndim
    spec[batch_axis] = "dp"
    spec[lat_axis] = "lat"
    spec[lon_axis] = "lon"
    return NamedSharding(mesh, P(*spec))
