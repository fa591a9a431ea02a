"""Host batching and device prefetch.

Replaces torch DataLoader (train.py:67-68) with a TPU-appropriate pipeline:
contiguous numpy batch assembly on the host, then a double-buffered
host->device transfer queue so the next batch's H2D copy overlaps the
current step's compute.  Sharded placement for data-parallel meshes is
handled by passing a ``sharding`` (the batch axis is split across devices by
``jax.device_put`` — per-host sharding for multi-host setups comes from each
host constructing its own slice of the global batch).
"""

from __future__ import annotations

import collections
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epoch: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (X, y) numpy batches from any dataset with __len__/__getitem__.

    drop_last=True keeps batch shapes static — one XLA compilation for the
    whole run (the reference's last partial batch would trigger a recompile).
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(np.uint32(seed) + np.uint32(epoch)).shuffle(order)
    stop = n - (n % batch_size) if drop_last else n
    for start in range(0, stop, batch_size):
        idx = order[start : start + batch_size]
        xs, ys = zip(*(dataset[int(i)] for i in idx))
        yield np.stack(xs), np.stack(ys)


def device_prefetch(
    iterator: Iterator,
    *,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator:
    """Move batches to device ``size`` steps ahead of consumption.

    jax.device_put is async: the H2D DMA for batch t+1 runs while batch t's
    step executes, hiding transfer latency behind compute.
    """

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        return jax.device_put(batch, sharding)

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
