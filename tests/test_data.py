"""Data-layer tests: stats fixture, splits, windowing, preprocessing."""

import numpy as np
import pytest

from nasa_niswan_tpu.data.dataset import (
    Normalizer,
    SequenceDataset,
    SingleStepDataset,
    make_preprocess_fn,
    masked_log10,
    reference_splits,
)
from nasa_niswan_tpu.data.pipeline import batch_iterator, device_prefetch
from nasa_niswan_tpu.data.statistics import load_statistics, species_stats
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d


@pytest.fixture(scope="module")
def data():
    return synthetic_e33oma_90d(T=96, seed=0)


def test_statistics_fixture_values():
    """Spot-check against reference variable_statistics.json values."""
    stats = load_statistics()
    assert stats["set1"]["u"].mean == pytest.approx(0.21191783249378204)
    assert stats["set1"]["bc_conc"].std == pytest.approx(57.252777099609375)
    assert stats["set2"]["w"].mean == pytest.approx(-2.6776010990142822)


def test_species_stats_channel_order():
    x_mean, x_std, y = species_stats("bcb")
    assert x_mean.shape == (5,)
    # channel order u, v, w, prec, src (dataset.py:520-526)
    assert x_mean[0] == pytest.approx(0.21191783249378204)
    assert x_mean[4] == pytest.approx(0.19962824881076813)  # bc_src
    assert y.mean == pytest.approx(4.951100826263428)


def test_reference_splits_match_90day_constants():
    # 4319 usable steps -> 3023 / 3455 (dataset.py:342, 601-612)
    assert reference_splits(4319) == (3023, 3455)


def test_masked_log10():
    x = np.array([10.0, 0.0, -3.0, 100.0], np.float32)
    np.testing.assert_allclose(masked_log10(x), [1.0, 0.0, 0.0, 2.0], rtol=1e-6)


def test_sequence_dataset_shapes_and_split(data):
    T = data["u"].shape[0]
    ds_tr = SequenceDataset(data, period="train", sequence_length=8)
    ds_va = SequenceDataset(data, period="val", sequence_length=8)
    ds_te = SequenceDataset(data, period="test", sequence_length=8)
    n_windows = T - 8 + 1
    tr_end, va_end = reference_splits(T)
    assert len(ds_tr) == tr_end
    assert len(ds_va) == va_end - tr_end
    assert len(ds_te) == n_windows - va_end
    x, y = ds_tr[0]
    assert x.shape == (8, 5, 90, 144) and y.shape == (90, 144)


def test_sequence_dataset_target_alignment(data):
    """Target is the concentration at the *last* window step (dataset.py:599)."""
    ds = SequenceDataset(data, period="train", sequence_length=8)
    x, y = ds.raw_item(3)
    np.testing.assert_array_equal(y, data["bcb_conc"][3 + 8 - 1])
    np.testing.assert_array_equal(x[0, 0], data["u"][3])
    np.testing.assert_array_equal(x[-1, 4], data["bcb_src"][3 + 7])


def test_sequence_dataset_static_channels(data):
    ds = SequenceDataset(
        data, period="train", sequence_length=4, in_channels=8,
        host_preprocessed=True,
    )
    x, _ = ds[0]
    assert x.shape == (4, 8, 90, 144)
    # static channels are z-scored over the grid and identical across time
    np.testing.assert_allclose(x[0, 5:], x[3, 5:])
    np.testing.assert_allclose(x[0, 5].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(x[0, 5].std(), 1.0, atol=1e-4)


def test_sequence_host_preprocessed_pads(data):
    ds = SequenceDataset(
        data, period="val", sequence_length=4, padding=(100, 154),
        host_preprocessed=True,
    )
    x, y = ds[0]
    assert x.shape == (4, 5, 100, 154)
    assert abs(float(y.mean())) < 10.0


def test_single_step_feedback_channel(data):
    ds = SingleStepDataset(data, period="test", in_channels=6)
    x, y = ds.raw_item(0)
    assert x.shape == (6, 90, 144)
    # channel 5 is the previous step's concentration: for test index 0 the
    # underlying time index is val_end, and inputs are lagged by 1
    _, val_end = reference_splits(len(data["u"]) - 1)
    np.testing.assert_array_equal(x[5], data["bcb_conc"][val_end])
    np.testing.assert_array_equal(y, data["bcb_conc"][val_end + 1])


def test_single_step_train_val_disjoint(data):
    tr = SingleStepDataset(data, period="train")
    va = SingleStepDataset(data, period="val")
    n = len(data["u"]) - 1
    tr_end, va_end = reference_splits(n)
    assert len(tr) == tr_end and len(va) == va_end - tr_end


def test_device_preprocess_matches_host(data):
    ds = SequenceDataset(
        data, period="train", sequence_length=4, padding=(100, 154),
        host_preprocessed=True,
    )
    pre = make_preprocess_fn(ds.normalizer, (100, 154))
    raw_x, raw_y = ds.raw_item(5)
    want_x, want_y = ds[5]
    got_x, got_y = pre(raw_x[None], raw_y[None])
    # device path returns NHWC
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got_x)[0], -1, 1), want_x, rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got_y)[0], want_y, rtol=1e-5, atol=1e-6)


def test_batch_iterator_and_prefetch(data):
    ds = SequenceDataset(data, period="train", sequence_length=4)
    batches = list(device_prefetch(batch_iterator(ds, 8, seed=1), size=2))
    assert all(b[0].shape == (8, 4, 5, 90, 144) for b in batches)
    assert len(batches) == len(ds) // 8
    # deterministic order for a given seed/epoch
    again = list(batch_iterator(ds, 8, seed=1))
    np.testing.assert_array_equal(np.asarray(batches[0][1]), again[0][1])


def test_synthetic_multispecies_shared_met():
    """Multi-species fixture: one atmosphere, per-species tracers; the first
    species reproduces the single-species draws bit-for-bit."""
    single = synthetic_e33oma_90d(T=32, seed=3)
    multi = synthetic_e33oma_90d(T=32, seed=3, species=("bcb", "ss", "clay"))
    for k in ("u", "v", "omega", "prec"):
        np.testing.assert_array_equal(multi[k], single[k])
    np.testing.assert_array_equal(multi["bcb_src"], single["bcb_src"])
    np.testing.assert_array_equal(multi["bcb_conc"], single["bcb_conc"])
    for sp in ("ss", "clay"):
        assert multi[f"{sp}_src"].shape == single["bcb_src"].shape
        assert not np.array_equal(multi[f"{sp}_src"], multi["bcb_src"])
    assert not np.array_equal(multi["ss_conc"], multi["clay_conc"])
