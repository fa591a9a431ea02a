"""End-to-end training tests on the synthetic fixture (CPU).

Small ConvLSTM + small UNet runs: loss decreases, val R^2 becomes strongly
positive (the fixture's tracer is advected from its inputs, so there is real
signal), checkpoints land in the reference's epoch-NNN layout, logger.npy
has the reference's 3-array format, config round-trips.
"""

import os

import numpy as np
import pytest

from nasa_niswan_tpu.data.dataset import SequenceDataset, SingleStepDataset
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
from nasa_niswan_tpu.models.registry import build_model
from nasa_niswan_tpu.train.checkpoint import (
    latest_epoch_dir,
    load_checkpoint,
    save_checkpoint,
)
from nasa_niswan_tpu.train.config import TrainConfig
from nasa_niswan_tpu.train.loop import fit, make_optimizer
from nasa_niswan_tpu.train.schedule import step_lr


# Reduced grid: the CI container is a single CPU core, so e2e tests run on a
# 24x36 grid (the framework is grid-size agnostic; full 90x144 runs happen on
# TPU via bench.py).
GRID = dict(H=24, W=36)


@pytest.fixture(scope="module")
def data():
    return synthetic_e33oma_90d(T=120, seed=1, **GRID)


def small_lstm_config(tmp_path, **kw):
    defaults = dict(
        model="LSTM-test",
        hidden_channels=(6, 6),
        kernel_size=(3, 3),
        num_layers=2,
        sequence_length=4,
        num_epochs=4,
        batch_size=8,
        input_size=(28, 42),
        learning_rate=1e-2,
        snapshot_dir=str(tmp_path / "snap"),
        checkpoint_every=2,
        synthetic_steps=120,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_convlstm_end_to_end_training(tmp_path, data):
    cfg = small_lstm_config(tmp_path)
    bundle = build_model(
        cfg.model, in_channels=5, hidden_channels=cfg.hidden_channels,
        kernel_sizes=cfg.kernel_size,
    )
    tr = SequenceDataset(data, period="train", sequence_length=cfg.sequence_length)
    va = SequenceDataset(data, period="val", sequence_length=cfg.sequence_length)
    out = fit(bundle, tr, va, cfg, verbose=False)

    log = out["logger"]
    assert len(log["MSELoss"]) == 4
    assert log["MSELoss"][-1] < log["MSELoss"][0]  # learning
    assert log["r2_score_val"][-1] > 0.3  # real signal on the fixture

    # reference checkpoint layout + logger.npy format
    ckpt = latest_epoch_dir(cfg.snapshot_dir)
    assert ckpt is not None and ckpt.endswith("epoch-004")  # every 2 epochs
    with open(os.path.join(cfg.snapshot_dir, "logger.npy"), "rb") as f:
        a, b, c = np.load(f), np.load(f), np.load(f)
    assert a.shape == b.shape == c.shape == (4,)

    # restore round-trip: params identical
    params, opt_state, meta = load_checkpoint(
        ckpt, out["params"], out["opt_state"]
    )
    assert meta["epoch"] == 4
    np.testing.assert_array_equal(
        np.asarray(params["head"]["w"]), np.asarray(out["params"]["head"]["w"])
    )


def test_unet_single_step_training(tmp_path, data):
    cfg = TrainConfig(
        model="UNet-test", in_channels=6, num_epochs=4, batch_size=8,
        input_size=(32, 48), learning_rate=3e-3, num_layers=3,
        snapshot_dir=str(tmp_path / "snap_unet"), checkpoint_every=0,
    )
    bundle = build_model(cfg.model, in_channels=6, unet_features=(4, 8, 16, 32))
    tr = SingleStepDataset(data, period="train", in_channels=6)
    va = SingleStepDataset(data, period="val", in_channels=6)
    out = fit(bundle, tr, va, cfg, verbose=False)
    log = out["logger"]
    assert all(np.isfinite(log["MSELoss"]))
    assert log["MSELoss"][-1] < log["MSELoss"][0]
    # UNet-6ch has the previous-step concentration feedback channel; a few
    # epochs reach solidly positive val R^2 on the fixture
    assert log["r2_score_val"][-1] > 0.2


def test_step_lr_matches_torch_semantics():
    # base 1e-3, step 10, gamma 0.9: epochs 1-10 -> 1e-3, 11 -> 9e-4 ...
    assert step_lr(1e-3, 10, 0.9, 0) == pytest.approx(1e-3)
    assert step_lr(1e-3, 10, 0.9, 9) == pytest.approx(1e-3)
    assert step_lr(1e-3, 10, 0.9, 10) == pytest.approx(9e-4)
    assert step_lr(1e-3, 10, 0.9, 25) == pytest.approx(1e-3 * 0.9**2)


def test_config_json_round_trip(tmp_path):
    cfg = small_lstm_config(tmp_path, species="clay", transform=True)
    path = cfg.dump()
    loaded = TrainConfig.load(path)
    assert loaded == cfg


def test_checkpoint_lr_override(tmp_path):
    import jax

    bundle = build_model("LSTM-t", in_channels=5, hidden_channels=(4,),
                         kernel_sizes=(3,))
    params, _ = bundle.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, (0.5, 0.999))
    opt_state = opt.init(params)
    d = save_checkpoint(str(tmp_path / "ck"), params, opt_state,
                        learning_rate=5e-4, epoch=7)
    # stored lr wins when no override (utils.py:48-50)
    _, _, meta = load_checkpoint(d, params, opt_state)
    assert meta["learning_rate"] == pytest.approx(5e-4)
    # explicit lr wins when given (utils.py:44-46)
    _, _, meta = load_checkpoint(d, params, opt_state, lr=1e-5)
    assert meta["learning_rate"] == pytest.approx(1e-5)


def test_training_with_static_channels(tmp_path, data):
    """The canonical launcher config (in_channels 8 = 5 dynamic + 3 static,
    launcher.sh:14): static channels are appended on device as constants."""
    cfg = small_lstm_config(tmp_path, num_epochs=1, in_channels=8,
                            snapshot_dir=str(tmp_path / "snap8"),
                            checkpoint_every=0)
    bundle = build_model(
        cfg.model, in_channels=8, hidden_channels=cfg.hidden_channels,
        kernel_sizes=cfg.kernel_size,
    )
    tr = SequenceDataset(data, period="train", sequence_length=cfg.sequence_length)
    va = SequenceDataset(data, period="val", sequence_length=cfg.sequence_length)
    out = fit(bundle, tr, va, cfg, static=data["static"], verbose=False)
    assert np.isfinite(out["logger"]["MSELoss"][0])
    # the input conv consumed 8 channels
    assert out["params"]["cells"][0]["w_x"].shape[2] == 8


def test_cli_main_fusion_mode(tmp_path):
    """--levels L drives config #2 end-to-end through the CLI main():
    fused C = 3L+2 channels, training runs, checkpoints land."""
    from nasa_niswan_tpu.train.__main__ import main

    cfg = TrainConfig(
        model="LSTM-fuse", num_layers=2, hidden_channels=(6, 6),
        kernel_size=(3, 3), sequence_length=4, num_epochs=1, batch_size=4,
        input_size=(32, 44), synthetic_steps=100, synthetic_grid=(24, 36),
        levels=3, checkpoint_every=1, snapshot_dir=str(tmp_path),
    )
    assert cfg.in_channels == 11  # 3*3 + 2 auto-derived
    out = main(cfg)
    assert len(out["logger"]["MSELoss"]) == 1
    assert os.path.isdir(tmp_path / "epoch-001")


def test_cli_main_seq2seq_mode(tmp_path):
    """--mode seq2seq drives config #3 end-to-end through the CLI main():
    feedback channel auto-added, closed-loop val R2 recorded, logger.npy
    written in the 3-array format."""
    from nasa_niswan_tpu.train.__main__ import main

    cfg = TrainConfig(
        model="LSTM-s2s", mode="seq2seq", num_layers=2, hidden_channels=(6, 6),
        kernel_size=(3, 3), sequence_length=6, num_epochs=2, batch_size=2,
        input_size=(32, 44), synthetic_steps=120, synthetic_grid=(24, 36),
        checkpoint_every=2, snapshot_dir=str(tmp_path),
    )
    assert cfg.in_channels == 6  # 5 forcings + feedback auto-derived
    out = main(cfg)
    assert "r2_val" in out["history"][-1]
    assert os.path.isdir(tmp_path / "epoch-002")
    with open(tmp_path / "logger.npy", "rb") as f:
        loss = np.load(f); r2t = np.load(f); r2v = np.load(f)
    assert loss.shape == (2,) and np.isfinite(r2v).all()


def test_cli_main_seq2seq_fusion(tmp_path):
    """configs #2 + #3 compose: seq2seq over the fused multi-level stack."""
    from nasa_niswan_tpu.train.__main__ import main

    cfg = TrainConfig(
        model="LSTM-s2sf", mode="seq2seq", num_layers=1, hidden_channels=(6,),
        kernel_size=(3,), sequence_length=4, num_epochs=1, batch_size=2,
        input_size=(32, 44), synthetic_steps=80, synthetic_grid=(24, 36),
        levels=2, checkpoint_every=0, snapshot_dir=str(tmp_path),
    )
    assert cfg.in_channels == 3 * 2 + 2 + 1
    out = main(cfg)
    assert np.isfinite(out["history"][-1]["loss"])


def test_device_resident_matches_host_pipeline(tmp_path, data):
    """The DeviceWindowSource path is a pure transport change: same shuffle
    order, same batches, same numbers as the host async pipeline."""
    cfg = small_lstm_config(tmp_path, num_epochs=2)
    mk = lambda: build_model(
        "LSTM-test", in_channels=5, hidden_channels=cfg.hidden_channels,
        kernel_sizes=cfg.kernel_size,
    )
    tr = SequenceDataset(data, period="train", sequence_length=cfg.sequence_length)
    va = SequenceDataset(data, period="val", sequence_length=cfg.sequence_length)
    out_d = fit(mk(), tr, va, cfg, verbose=False, device_resident=True)
    out_h = fit(mk(), tr, va, cfg, verbose=False, device_resident=False)
    np.testing.assert_allclose(
        out_d["logger"]["MSELoss"], out_h["logger"]["MSELoss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        out_d["logger"]["r2_score_val"], out_h["logger"]["r2_score_val"],
        rtol=1e-5,
    )


def test_checkpoint_round_trips_bn_running_stats(tmp_path, data):
    """torch's state_dict carries BatchNorm running stats (the reference
    checkpoints it whole, utils.py:23-32); ours must too — an eval or
    resume from checkpoint may not silently run BN with fresh (0, 1)
    stats."""
    cfg = TrainConfig(
        model="UNet-bn", in_channels=6, num_epochs=1, batch_size=8,
        input_size=(32, 48), snapshot_dir=str(tmp_path / "snap_bn"),
        checkpoint_every=1,
    )
    bundle = build_model(cfg.model, in_channels=6, unet_features=(4, 8, 16, 32))
    tr = SingleStepDataset(data, period="train", in_channels=6)
    va = SingleStepDataset(data, period="val", in_channels=6)
    out = fit(bundle, tr, va, cfg, verbose=False)

    import jax

    from nasa_niswan_tpu.train.checkpoint import latest_epoch_dir

    tmpl_params, tmpl_state = bundle.init(jax.random.PRNGKey(0))
    ck = latest_epoch_dir(cfg.snapshot_dir)
    params, _, state, meta = load_checkpoint(
        ck, tmpl_params, state_template=tmpl_state
    )
    # restored running stats equal the final training state, and differ
    # from the fresh template (training moved them)
    got = jax.tree_util.tree_leaves(state)
    want = jax.tree_util.tree_leaves(out["state"])
    fresh = jax.tree_util.tree_leaves(tmpl_state)
    assert any(
        not np.allclose(g, f) for g, f in zip(got, fresh)
    ), "running stats indistinguishable from fresh init"
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # stateless families: state=None round-trips as None
    p2, _, s2, _ = load_checkpoint(ck, tmpl_params, state_template=None)
    assert s2 is None
