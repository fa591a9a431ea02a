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


def test_seq2seq_dp_steps_match_single_device(data):
    """Config #3 x config #4: the GSPMD and shard_map data-parallel seq2seq
    steps on the 8-device CPU mesh reproduce the single-device trajectory on
    the same global batch — same scheduled-sampling draws (shared rng), same
    loss/R^2/params over chained optimizer steps."""
    from nasa_niswan_tpu.parallel.mesh import make_mesh
    from nasa_niswan_tpu.rollout.seq2seq import (
        make_seq2seq_train_step_shardmap,
    )

    ds = Seq2SeqDataset(data, period="train", sequence_length=4)
    cfg = ConvLSTMConfig(6, (4, 4), (3, 3))
    params0 = convlstm_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, (0.5, 0.999))
    mesh = make_mesh(dp=8)
    kw = dict(padded_shape=PADDED, grid_shape=GRID)
    steps = {
        "single": make_seq2seq_train_step(cfg, ds.normalizer, opt, **kw),
        "gspmd": make_seq2seq_train_step(
            cfg, ds.normalizer, opt, mesh=mesh, **kw
        ),
        "shardmap": make_seq2seq_train_step_shardmap(
            cfg, ds.normalizer, opt, mesh=mesh, **kw
        ),
    }
    batches = []
    for s in range(2):
        xs, p0s, ys = zip(*(ds[i] for i in range(8 * s, 8 * (s + 1))))
        batches.append((np.stack(xs), np.stack(p0s), np.stack(ys)))

    results = {}
    for name, step in steps.items():
        params, opt_state = params0, opt.init(params0)
        hist = []
        for i, batch in enumerate(batches):
            params, opt_state, m = step(
                params, opt_state, *batch, jax.random.PRNGKey(10 + i), 0.6
            )
            hist.append((float(m["loss"]), float(m["r2"])))
        results[name] = (hist, params)

    want_hist, want_params = results["single"]
    for name in ("gspmd", "shardmap"):
        got_hist, got_params = results[name]
        np.testing.assert_allclose(got_hist, want_hist, rtol=2e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(got_params), jax.tree.leaves(want_params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
            )


def test_fit_seq2seq_dp_matches_single_device(data):
    """fit_seq2seq(dp_devices=8) walks the same loss/R^2 history as the
    single-device driver (same seeds, same async-batch order)."""
    ds = Seq2SeqDataset(data, period="train", sequence_length=4)
    cfg = ConvLSTMConfig(6, (4,), (3,))
    params0 = convlstm_init(jax.random.PRNGKey(3), cfg)
    kw = dict(
        padded_shape=PADDED, grid_shape=GRID, num_epochs=2, batch_size=8,
        learning_rate=1e-3, verbose=False,
    )
    _, _, hist_1 = fit_seq2seq(cfg, params0, ds, **kw)
    _, _, hist_8 = fit_seq2seq(cfg, params0, ds, dp_devices=8, **kw)
    for h1, h8 in zip(hist_1, hist_8):
        np.testing.assert_allclose(h8["loss"], h1["loss"], rtol=1e-4)
        np.testing.assert_allclose(h8["r2"], h1["r2"], rtol=1e-3, atol=1e-5)


def test_fit_seq2seq_dp_batch_divisibility_error(data):
    ds = Seq2SeqDataset(data, period="train", sequence_length=4)
    cfg = ConvLSTMConfig(6, (4,), (3,))
    params0 = convlstm_init(jax.random.PRNGKey(3), cfg)
    with pytest.raises(ValueError, match="divisible"):
        fit_seq2seq(
            cfg, params0, ds, padded_shape=PADDED, grid_shape=GRID,
            num_epochs=1, batch_size=6, dp_devices=4, verbose=False,
        )


def test_seq2seq_fused_bptt_matches_xla(data):
    """The whole-chunk fused BPTT (ops/seq2seq_bptt.py — the pallas2+remat
    path of _make_forward_chunk) must produce the same loss/R2 AND the same
    parameter gradients as XLA autodiff through the plain per-step scan,
    with identical scheduled-sampling draws (shared rng)."""
    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.rollout.seq2seq import (
        _make_forward_chunk,
        _r2_from_stats,
    )

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
        (l1, s1), g1 = run(base, tp)
        (l2, s2), g2 = run(fused, tp)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        np.testing.assert_allclose(
            float(_r2_from_stats(s1)), float(_r2_from_stats(s2)),
            rtol=1e-4, atol=1e-6,
        )
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
            )
