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


def test_async_round_trip_model_state(tmp_path):
    """Non-parameter buffers (UNet BN running stats) ride along like
    torch's state_dict; old-style restores (no state_template) still
    return the 3-tuple."""
    params = convlstm_init(jax.random.PRNGKey(0), ConvLSTMConfig(3, (4,), (3,)))
    state = {"bn": {"mean": np.full((4,), 0.7, np.float32),
                    "var": np.full((4,), 1.3, np.float32)}}
    ck = AsyncCheckpointer(str(tmp_path / "cks"), max_to_keep=2)
    try:
        ck.save(1, params, learning_rate=1e-3, model_state=state)
        ck.wait()
        tmpl = {"bn": {"mean": np.zeros((4,), np.float32),
                       "var": np.ones((4,), np.float32)}}
        p2, _, s2, meta = ck.restore_latest(params, state_template=tmpl)
        np.testing.assert_array_equal(s2["bn"]["mean"], state["bn"]["mean"])
        np.testing.assert_array_equal(s2["bn"]["var"], state["bn"]["var"])
        out = ck.restore_latest(params)
        assert len(out) == 3
    finally:
        ck.close()
