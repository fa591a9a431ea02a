"""Async orbax checkpoint backend round-trip."""

import jax
import numpy as np

from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
from nasa_niswan_tpu.train.checkpoint_orbax import HAVE_ORBAX, AsyncCheckpointer


def test_async_round_trip(tmp_path):
    assert HAVE_ORBAX
    params = convlstm_init(jax.random.PRNGKey(0), ConvLSTMConfig(3, (4,), (3,)))
    ck = AsyncCheckpointer(str(tmp_path / "ck"), max_to_keep=2)
    try:
        ck.save(1, params, learning_rate=1e-3)
        ck.save(2, params, learning_rate=9e-4)
        ck.wait()
        p2, _, meta = ck.restore_latest(params)
        assert meta["epoch"] == 2
        assert abs(meta["learning_rate"] - 9e-4) < 1e-9
        np.testing.assert_array_equal(
            np.asarray(p2["head"]["w"]), np.asarray(params["head"]["w"])
        )
    finally:
        ck.close()


def test_restore_latest_empty(tmp_path):
    ck = AsyncCheckpointer(str(tmp_path / "empty"))
    try:
        assert ck.restore_latest({}) is None
    finally:
        ck.close()
