"""Metric golden tests vs sklearn/scipy (the reference's metric sources)."""

import numpy as np
import pytest
from scipy.stats import pearsonr
from sklearn.metrics import r2_score

from nasa_niswan_tpu.evalx.metrics import (
    REGIONS,
    coslat_weighted_mean,
    exceedance_curve,
    lat_band_weighted_r2,
    pearson_r,
    r2,
    r2_spatial,
    r2_temporal,
    random_sampling,
    regional_slice,
)


def test_r2_matches_sklearn(rng):
    a = rng.standard_normal(1000).astype(np.float64)
    b = a + 0.3 * rng.standard_normal(1000)
    assert float(r2(a, b)) == pytest.approx(r2_score(a, b), rel=1e-6)


def test_r2_temporal_matches_per_step_sklearn(rng):
    gts = rng.standard_normal((6, 9, 14))
    pds = gts + 0.2 * rng.standard_normal((6, 9, 14))
    got = np.asarray(r2_temporal(gts, pds))
    want = [r2_score(g.ravel(), p.ravel()) for g, p in zip(gts, pds)]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_r2_spatial_matches_notebook_formula(rng):
    gts = rng.standard_normal((20, 9, 14))
    pds = gts + 0.1 * rng.standard_normal((20, 9, 14))
    got = np.asarray(r2_spatial(gts, pds))
    ss_res = np.sum((gts - pds) ** 2, axis=0)
    ss_tot = np.sum((gts - gts.mean(axis=0)) ** 2, axis=0)
    np.testing.assert_allclose(got, 1 - ss_res / ss_tot, rtol=1e-4)
    # per-gridpoint sklearn cross-check on a few points
    for (i, j) in [(0, 0), (4, 7), (8, 13)]:
        assert got[i, j] == pytest.approx(r2_score(gts[:, i, j], pds[:, i, j]), rel=1e-4)


def test_pearson_matches_scipy(rng):
    a = rng.standard_normal(500)
    b = 0.5 * a + rng.standard_normal(500)
    assert float(pearson_r(a, b)) == pytest.approx(pearsonr(a, b).statistic, rel=1e-6)


def test_coslat_weighted_mean(rng):
    from nasa_niswan_tpu.core.grid import MODELE_2x2P5 as g

    field = rng.standard_normal((90, 144))
    w = np.cos(np.deg2rad(g.lat))
    want = (field * w[:, None]).sum(axis=0) / w.sum()
    got = np.asarray(coslat_weighted_mean(field, g.lat))
    np.testing.assert_allclose(got, want, rtol=1e-4)  # f32 on device


def test_lat_band_weighted_r2(rng):
    from nasa_niswan_tpu.core.grid import MODELE_2x2P5 as g

    r2_map = rng.uniform(-1, 1, (90, 144))
    weight = rng.uniform(0, 1, (90, 144))
    sel = (g.lat >= -21) & (g.lat <= 21)
    want = (weight[sel] * r2_map[sel]).sum() / weight[sel].sum()
    got = float(lat_band_weighted_r2(r2_map, weight, g.lat, (-21, 21)))
    assert got == pytest.approx(want, rel=1e-4)


def test_regional_slice_shapes():
    from nasa_niswan_tpu.core.grid import MODELE_2x2P5 as g

    field = np.zeros((5, 90, 144))
    for name in REGIONS:
        out = np.asarray(regional_slice(field, g.lat, g.lon, name))
        assert out.shape[0] == 5 and out.shape[1] > 0 and out.shape[2] > 0
    # Amazon box: lat (-15, 5) at 2-degree centers (-15..5 inclusive) -> 11
    # rows; lon (-75, -45) at 2.5-degree centers -> 12 cols
    am = np.asarray(regional_slice(field, g.lat, g.lon, "Amazon"))
    assert am.shape == (5, 11, 12)


def test_exceedance_curve():
    v, ep = exceedance_curve(np.array([3.0, 1.0, 2.0]))
    np.testing.assert_array_equal(v, [3.0, 2.0, 1.0])
    np.testing.assert_allclose(ep, [25.0, 50.0, 75.0])


def test_random_sampling_deterministic():
    data = np.arange(100000, dtype=np.float32)
    a = random_sampling(data, 100)
    b = random_sampling(data, 100)
    np.testing.assert_array_equal(a, b)
