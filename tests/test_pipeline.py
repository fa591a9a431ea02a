"""Host data pipeline: the async background-thread loader must be a pure
scheduling change — identical batches, bounded memory, clean error paths.
(Replaces the DataLoader-workers role, train.py:67-68,197-198.)"""

import numpy as np
import pytest

from nasa_niswan_tpu.data.pipeline import async_batches, batch_iterator


class _ArrayDataset:
    def __init__(self, n=13, shape=(3, 4, 5)):
        rng = np.random.default_rng(7)
        self.x = rng.standard_normal((n, *shape)).astype(np.float32)
        self.y = rng.standard_normal((n, 4, 5)).astype(np.float32)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return self.x[i], self.y[i]


def test_async_batches_match_sync_iterator():
    ds = _ArrayDataset()
    for drop_last in (True, False):
        want = list(
            batch_iterator(ds, 4, shuffle=True, seed=3, epoch=2,
                           drop_last=drop_last)
        )
        got = list(
            async_batches(ds, 4, shuffle=True, seed=3, epoch=2,
                          drop_last=drop_last, to_device=False)
        )
        assert len(got) == len(want)
        for (gx, gy), (wx, wy) in zip(got, want):
            np.testing.assert_array_equal(gx, wx)
            np.testing.assert_array_equal(gy, wy)


def test_async_batches_device_put_and_sharding_none():
    ds = _ArrayDataset()
    batches = list(async_batches(ds, 4, shuffle=False))
    import jax

    assert all(isinstance(bx, jax.Array) for bx, _ in batches)


def test_async_batches_propagates_producer_error():
    class Broken(_ArrayDataset):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("bad sample")
            return super().__getitem__(i)

    with pytest.raises(ValueError, match="bad sample"):
        list(async_batches(Broken(), 4, shuffle=False, to_device=False))


def test_async_batches_early_break_shuts_down():
    ds = _ArrayDataset(n=64)
    it = async_batches(ds, 4, shuffle=False, to_device=False, prefetch=2)
    next(it)
    it.close()  # must not hang on the bounded queue


def test_chunk_drain_one_behind_order_and_fetchers():
    """ChunkDrain fetches exactly one dispatch behind, preserves order, and
    applies each chunk's own fetcher (the n_valid-capturing lambdas of the
    serve loops)."""
    import numpy as np

    from nasa_niswan_tpu.data.pipeline import ChunkDrain

    fetched = []

    def make_fetch(tag, n):
        def fetch(x):
            fetched.append(tag)
            return np.asarray(x)[:n]
        return fetch

    drain = ChunkDrain()
    drain.push(np.arange(4), make_fetch("a", 4))
    assert fetched == []  # nothing fetched until the NEXT push
    drain.push(np.arange(10, 14), make_fetch("b", 2))
    assert fetched == ["a"]
    out = drain.finish()
    assert fetched == ["a", "b"]
    np.testing.assert_array_equal(np.concatenate(out), [0, 1, 2, 3, 10, 11])
    assert drain.finish() == []  # ownership transferred; nothing retained
    import pytest

    with pytest.raises(RuntimeError, match="finished"):
        drain.push(np.arange(2))  # closed: no silent cross-episode mixing
