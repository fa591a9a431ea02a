"""Rollout tests: the compiled state-carrying rollout must agree with the
windowed forward (the reference's sliding-window inference), chunk cleanly,
and drive the OAT sensitivity tool."""

import jax
import numpy as np
import pytest

from nasa_niswan_tpu.data.dataset import Normalizer
from nasa_niswan_tpu.models.convlstm import (
    ConvLSTMConfig,
    convlstm_apply,
    convlstm_init,
    nchw_to_nhwc_seq,
)
from nasa_niswan_tpu.rollout.autoregressive import (
    make_rollout_fn,
    make_streaming_rollout,
    model_days_per_min,
)
from nasa_niswan_tpu.rollout.sensitivity import oat_sensitivity

GRID = (12, 16)
PADDED = (16, 20)


@pytest.fixture(scope="module")
def setup():
    cfg = ConvLSTMConfig(in_channels=5, hidden_channels=(4, 4), kernel_sizes=(3, 3))
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32) + 0.1,
        x_std=np.ones(5, np.float32) * 2.0,
        y_mean=0.5,
        y_std=3.0,
    )
    forcings = (
        np.random.default_rng(0).standard_normal((2, 10, 5, *GRID)).astype(np.float32)
    )
    return cfg, params, norm, forcings


def test_rollout_matches_stateful_forward(setup):
    """Prediction at step t from the carrying rollout equals running the
    model over the full prefix [0..t] from zero state (scan-carry law)."""
    cfg, params, norm, forcings = setup
    rollout = make_rollout_fn(
        cfg, norm, padded_shape=PADDED, grid_shape=GRID, unnormalize=False
    )
    preds, _ = rollout(params, forcings)
    assert preds.shape == (2, 10, *GRID)

    from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo

    for t in [0, 3, 9]:
        x = (forcings[:, : t + 1] - norm.x_mean.reshape(-1, 1, 1)) / norm.x_std.reshape(
            -1, 1, 1
        )
        x = pad_geo(x, PADDED)
        want = convlstm_apply(params, np.asarray(nchw_to_nhwc_seq(x)), cfg)
        want = crop_to_grid(want[..., 0], GRID)
        np.testing.assert_allclose(
            np.asarray(preds[:, t]), np.asarray(want), atol=2e-5
        )


def test_rollout_chunking_equivalence(setup):
    """One 10-step rollout == two 5-step rollouts with carried state — the
    contract decadal runs rely on."""
    cfg, params, norm, forcings = setup
    rollout = make_rollout_fn(cfg, norm, padded_shape=PADDED, grid_shape=GRID)
    full, _ = rollout(params, forcings)
    a, state = rollout(params, forcings[:, :5])
    b, _ = rollout(params, forcings[:, 5:], state)
    np.testing.assert_allclose(
        np.asarray(full), np.concatenate([np.asarray(a), np.asarray(b)], axis=1),
        atol=1e-5,
    )


def test_rollout_unnormalizes(setup):
    cfg, params, norm, forcings = setup
    r_norm = make_rollout_fn(
        cfg, norm, padded_shape=PADDED, grid_shape=GRID, unnormalize=False
    )
    r_phys = make_rollout_fn(
        cfg, norm, padded_shape=PADDED, grid_shape=GRID, unnormalize=True
    )
    a, _ = r_norm(params, forcings)
    b, _ = r_phys(params, forcings)
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a) * norm.y_std + norm.y_mean, atol=1e-5
    )


def test_streaming_wrapper_matches_batch_rollout(setup):
    cfg, params, norm, forcings = setup
    rollout = make_rollout_fn(cfg, norm, padded_shape=PADDED, grid_shape=GRID)
    want, _ = rollout(params, forcings)
    step = make_streaming_rollout(
        cfg, norm, params, padded_shape=PADDED, grid_shape=GRID
    )
    got = np.stack([np.asarray(step(forcings[:, t])) for t in range(10)], axis=1)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_oat_sensitivity(setup):
    cfg, params, norm, forcings = setup
    rollout = make_rollout_fn(cfg, norm, padded_shape=PADDED, grid_shape=GRID)
    out = oat_sensitivity(rollout, params, forcings, channels=[0, 4])
    assert set(out) == {"u", "src"}
    assert out["u"].shape == (2, 10, *GRID)
    assert (out["u"] >= 0).all()
    assert out["u"].max() > 0  # perturbation must propagate

    # batched fold: all variants in one rollout call, same deltas
    b = oat_sensitivity(
        rollout, params, forcings[:1], channels=[0, 4], batched=True
    )
    s = oat_sensitivity(rollout, params, forcings[:1], channels=[0, 4])
    for k in s:
        np.testing.assert_allclose(b[k], s[k], atol=1e-5)
    with pytest.raises(ValueError, match="B == 1"):
        oat_sensitivity(rollout, params, forcings, batched=True)


def test_model_days_per_min():
    # 480 steps at 48/day in 30 s -> 10 days / 0.5 min = 20 days/min
    assert model_days_per_min(480, 30.0) == pytest.approx(20.0)
    assert model_days_per_min(480, 30.0, batch=4) == pytest.approx(80.0)


def test_auto_cell_impl_selection(setup, monkeypatch):
    """cell_impl='auto' picks the fused pallas2 kernel only at B=1 on a TPU
    backend, keeps the config impl off-TPU, and honors explicit overrides."""
    from nasa_niswan_tpu.rollout import autoregressive as ar

    cfg, params, norm, forcings = setup

    chosen = []
    real_apply = ar.convlstm_apply

    def spy(params, x, config, **kw):
        chosen.append(config.cell_impl)
        return real_apply(params, x, config, **kw)

    monkeypatch.setattr(ar, "convlstm_apply", spy)

    # off-TPU (this suite runs on the CPU mesh): auto keeps the config impl
    r = make_rollout_fn(cfg, norm, padded_shape=PADDED, grid_shape=GRID)
    r(params, forcings)
    assert chosen[-1] == cfg.cell_impl == "xla"

    # fake a TPU backend: B<=4 -> pallas2 (interpreted here), B>4 -> xla
    monkeypatch.setattr(ar, "_serving_backend", lambda: "tpu")
    r = make_rollout_fn(cfg, norm, padded_shape=PADDED, grid_shape=GRID)
    p1, _ = r(params, forcings[:1, :3])
    assert chosen[-1] == "pallas2"
    big = np.concatenate([forcings[:, :3]] * 3, axis=0)  # B=6
    r(params, big)
    assert chosen[-1] == "xla"

    # explicit override beats auto
    r = make_rollout_fn(
        cfg, norm, padded_shape=PADDED, grid_shape=GRID, cell_impl="xla"
    )
    p1x, _ = r(params, forcings[:1, :3])
    assert chosen[-1] == "xla"
    # and the two impls agree numerically (f32, interpreter vs XLA)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p1x), atol=1e-4)
