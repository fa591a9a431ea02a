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
import queue as queue_mod
import threading
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
    """Yield stacked numpy batches from any dataset with __len__/__getitem__.

    Samples may be any fixed-arity tuple — (X, y) pairs or e.g. the
    (X, prev0, y) triplets of Seq2SeqDataset; each position is stacked.

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
        cols = zip(*(dataset[int(i)] for i in idx))
        yield tuple(np.stack(col) for col in cols)


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


class _Stop:
    pass


_STOP = _Stop()


def async_batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epoch: int = 0,
    prefetch: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
    to_device: bool = True,
) -> Iterator:
    """Background-thread batch pipeline (the DataLoader-workers role,
    train.py:67-68 / num_workers at train.py:197-198 — re-designed for one
    host feeding a TPU).

    A producer thread runs ``__getitem__`` + ``np.stack`` + the H2D
    ``jax.device_put`` for up to ``prefetch`` batches ahead of the consumer,
    so host batch assembly and the H2D DMA both overlap the current step's
    device compute.  numpy slicing/stacking releases the GIL, and
    ``device_put`` is async (returns before the DMA completes), so a single
    producer thread suffices even on a 1-core host.

    The queue is bounded: at most ``prefetch`` assembled batches are alive,
    so host RSS stays flat regardless of epoch length.  Producer exceptions
    are re-raised in the consumer.  The generator's ``close()`` (invoked by
    ``break``/GC) shuts the producer down.
    """

    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()

    def put(batch):
        if not to_device:
            return batch
        if sharding is None:
            return jax.device_put(batch)
        return jax.device_put(batch, sharding)

    def producer():
        try:
            it = batch_iterator(
                dataset,
                batch_size,
                shuffle=shuffle,
                seed=seed,
                drop_last=drop_last,
                epoch=epoch,
            )
            for batch in it:
                if stop.is_set():
                    return
                q.put(put(batch))
            q.put(_STOP)
        except BaseException as e:  # surfaced in the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True, name="batch-producer")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _STOP:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so a blocked producer can observe `stop` and exit
        try:
            while True:
                q.get_nowait()
        except queue_mod.Empty:
            pass
        t.join(timeout=5.0)


class ChunkDrain:
    """Fetch device chunks ONE DISPATCH BEHIND the serving loop.

    The serving/eval chunk loops dispatch a jitted chunk, then drain its
    predictions to the host; fetching eagerly blocks the dispatch queue so
    device compute and the D2H drain never overlap.  ``push`` a device
    array each iteration and the PREVIOUS one is fetched while the chunk
    just dispatched computes (JAX dispatch is async); ``finish`` drains
    the last.  Used by run_chunked_episode_carry (evalx/evaluate.py), the
    open-loop serve loop (rollout/__main__.py), and the long-horizon
    demo runners.
    """

    def __init__(self):
        self._pending = None
        self._out = []
        self._closed = False

    def push(self, device_chunk, fetch=np.asarray):
        if self._closed:
            raise RuntimeError("ChunkDrain already finished; make a new one")
        if self._pending is not None:
            dev, f = self._pending
            self._out.append(f(dev))
        self._pending = (device_chunk, fetch)

    def finish(self) -> list:
        """Drain the pending chunk and hand the fetched list to the caller
        (ownership transferred — the drain keeps no reference and refuses
        further pushes)."""
        if self._pending is not None:
            dev, f = self._pending
            self._out.append(f(dev))
            self._pending = None
        self._closed = True
        out, self._out = self._out, []
        return out
