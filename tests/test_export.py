"""Frozen serving artifact: export -> serialize -> load -> call must match
the live rollout, including the carried-state chunk contract."""

import jax
import numpy as np
import pytest

from nasa_niswan_tpu.data.dataset import Normalizer
from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn
from nasa_niswan_tpu.rollout.export import (
    export_rollout,
    initial_rollout_state,
    load_rollout,
)

GRID = (12, 16)
PADDED = (16, 20)


def test_export_roundtrip_matches_live_rollout(tmp_path):
    cfg = ConvLSTMConfig(
        in_channels=5, hidden_channels=(4, 4), kernel_sizes=(3, 3)
    )
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32) + 0.1,
        x_std=np.ones(5, np.float32) * 2.0,
        y_mean=0.5,
        y_std=3.0,
    )
    f = (
        np.random.default_rng(0)
        .standard_normal((1, 8, 5, *GRID))
        .astype(np.float32)
    )

    path = str(tmp_path / "rollout.bin")
    blob = export_rollout(
        cfg, norm, params, batch=1, chunk_steps=4, n_channels=5,
        grid_shape=GRID, padded_shape=PADDED, path=path,
    )
    assert len(blob) > 1000
    serve = load_rollout(path)

    live = make_rollout_fn(
        cfg, norm, padded_shape=PADDED, grid_shape=GRID
    )
    want, _ = live(params, f)

    st = initial_rollout_state(cfg, 1, PADDED)
    p1, st = serve(f[:, :4], st)
    p2, st = serve(f[:, 4:], st)
    got = np.concatenate([np.asarray(p1), np.asarray(p2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
    # the artifact's state contract is the standard layout
    assert st[0][0].shape == (1, *PADDED, 4)


def test_export_bakes_params_and_normalizer(tmp_path):
    """Different params/normalizer must produce a different artifact result
    (they are constants in the artifact, not inputs)."""
    cfg = ConvLSTMConfig(
        in_channels=5, hidden_channels=(4,), kernel_sizes=(3,)
    )
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32), x_std=np.ones(5, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    f = (
        np.random.default_rng(1)
        .standard_normal((1, 3, 5, *GRID))
        .astype(np.float32)
    )
    outs = []
    for seed in (0, 1):
        params = convlstm_init(jax.random.PRNGKey(seed), cfg)
        blob = export_rollout(
            cfg, norm, params, batch=1, chunk_steps=3, n_channels=5,
            grid_shape=GRID, padded_shape=PADDED,
        )
        serve = load_rollout(blob)
        p, _ = serve(f, initial_rollout_state(cfg, 1, PADDED))
        outs.append(np.asarray(p))
    assert not np.allclose(outs[0], outs[1])
