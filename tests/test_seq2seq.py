"""Scheduled-sampling seq2seq training tests (BASELINE config #3)."""

import jax
import numpy as np
import pytest

from nasa_niswan_tpu.data.dataset import Seq2SeqDataset
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
from nasa_niswan_tpu.rollout.seq2seq import (
    fit_seq2seq,
    inverse_sigmoid_schedule,
    make_seq2seq_train_step,
)
from nasa_niswan_tpu.train.loop import make_optimizer

GRID = (16, 24)
PADDED = (20, 28)


@pytest.fixture(scope="module")
def data():
    return synthetic_e33oma_90d(T=140, seed=4, H=GRID[0], W=GRID[1])


def test_dataset_alignment(data):
    ds = Seq2SeqDataset(data, period="train", sequence_length=6)
    x, prev0, y = ds[0]
    assert x.shape == (6, 5, *GRID)
    assert prev0.shape == GRID
    assert y.shape == (6, *GRID)
    # feedback frame is the concentration right before the chunk
    np.testing.assert_array_equal(prev0, data["bcb_conc"][0])
    np.testing.assert_array_equal(y[0], data["bcb_conc"][1])
    np.testing.assert_array_equal(x[0, 0], data["u"][1])


def test_schedule_decays():
    ps = [inverse_sigmoid_schedule(e) for e in (1, 10, 30, 60)]
    assert all(0 <= p <= 1 for p in ps)
    assert ps == sorted(ps, reverse=True)
    assert ps[0] > 0.85 and ps[-1] < 0.05


def test_seq2seq_training_learns(data):
    ds = Seq2SeqDataset(data, period="train", sequence_length=6)
    cfg = ConvLSTMConfig(in_channels=6, hidden_channels=(6, 6), kernel_sizes=(3, 3))
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    params, _, hist = fit_seq2seq(
        cfg, params, ds, padded_shape=PADDED, grid_shape=GRID, num_epochs=3,
        batch_size=4, learning_rate=1e-2, verbose=False,
    )
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["r2"])


def test_teacher_prob_extremes_differ(data):
    """teacher_prob=1 (pure teacher forcing) and 0 (pure autoregressive)
    must produce different losses on an untrained model — the feedback path
    is live."""
    ds = Seq2SeqDataset(data, period="train", sequence_length=6)
    cfg = ConvLSTMConfig(in_channels=6, hidden_channels=(4,), kernel_sizes=(3,))
    params = convlstm_init(jax.random.PRNGKey(1), cfg)
    opt = make_optimizer(1e-3, (0.5, 0.999))
    step = make_seq2seq_train_step(
        cfg, ds.normalizer, opt, padded_shape=PADDED, grid_shape=GRID
    )
    xs, p0s, ys = zip(*(ds[i] for i in range(4)))
    batch = (np.stack(xs), np.stack(p0s), np.stack(ys))
    rng = jax.random.PRNGKey(2)
    _, _, m1 = step(params, opt.init(params), *batch, rng, 1.0)
    _, _, m0 = step(params, opt.init(params), *batch, rng, 0.0)
    assert float(m1["loss"]) != pytest.approx(float(m0["loss"]), rel=1e-6)


def test_seq2seq_fused_bptt_matches_xla(data):
    """The whole-chunk fused BPTT (ops/seq2seq_bptt.py — the pallas2+remat
    path of _make_forward_chunk) must produce the same loss/R2 AND the same
    parameter gradients as XLA autodiff through the plain per-step scan,
    with identical scheduled-sampling draws (shared rng)."""
    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.rollout.seq2seq import _make_forward_chunk

    rng = np.random.default_rng(7)
    B, T = 2, 4
    x = jnp.asarray(rng.standard_normal((B, T, 5, *GRID)).astype(np.float32))
    prev0 = jnp.asarray(rng.standard_normal((B, *GRID)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, T, *GRID)).astype(np.float32))
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32), x_std=np.ones(5, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    base = ConvLSTMConfig(6, (4, 4), (5, 3))
    fused = ConvLSTMConfig(6, (4, 4), (5, 3), cell_impl="pallas2", remat=True)
    params = convlstm_init(jax.random.PRNGKey(0), base)
    key = jax.random.PRNGKey(3)

    def run(cfg, teacher_prob):
        fc = _make_forward_chunk(
            cfg, norm, padded_shape=PADDED, grid_shape=GRID
        )
        return jax.value_and_grad(
            lambda p: fc(p, x, prev0, y, key, teacher_prob), has_aux=True
        )(params)

    for tp in (0.5, 0.0, 1.0):
        (l1, r1), g1 = run(base, tp)
        (l2, r2), g2 = run(fused, tp)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        np.testing.assert_allclose(float(r1), float(r2), rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
            )
