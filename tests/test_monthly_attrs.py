"""Monthly-attributes merge (dataset_config.ipynb cells 29-34) — the
TPU-native gather is oracle-tested against the reference's actual pandas
left-merge semantics."""

import numpy as np
import pandas as pd
import pytest

from nasa_niswan_tpu.data.monthly import (
    MONTHLY_ATTRIBUTES,
    fractional_year_to_date,
    load_monthly_attrs,
    merge_monthly,
    month_index,
    monthly_climatology,
)
from nasa_niswan_tpu.data.ncfixture import write_monthly_fixture


def test_fractional_year_decode():
    """cell 22's decode: integer year -> Jan 1; .5 -> mid-year under the
    365-day approximation."""
    assert fractional_year_to_date(1950.0) == pd.Timestamp("1950-01-01")
    d = fractional_year_to_date(1950.5)
    assert (d.month, d.day) == (7, 2)
    assert fractional_year_to_date(1951 + 30.5 / 365).month == 1


def test_load_and_climatology_roundtrip(tmp_path):
    root = str(tmp_path / "ma")
    oracle = write_monthly_fixture(root, months=12, H=6, W=8)
    months, fields = load_monthly_attrs(root)
    assert list(months) == list(range(1, 13))
    assert set(fields) == set(MONTHLY_ATTRIBUTES)
    for n in MONTHLY_ATTRIBUTES:
        np.testing.assert_array_equal(fields[n], oracle[n])
    table = monthly_climatology(months, fields)
    assert table.shape == (12, 6, 8, len(MONTHLY_ATTRIBUTES))
    assert not np.isnan(table).any()
    np.testing.assert_allclose(
        table[3, ..., MONTHLY_ATTRIBUTES.index("sss")], oracle["sss"][3]
    )


def test_multiyear_climatology_averages(tmp_path):
    """Two years of records: the table averages same-calendar-month
    frames (the multi-year mean a climatology is)."""
    root = str(tmp_path / "ma2")
    oracle = write_monthly_fixture(root, months=24, H=4, W=5)
    months, fields = load_monthly_attrs(root)
    table = monthly_climatology(months, fields)
    k = MONTHLY_ATTRIBUTES.index("landfr")
    np.testing.assert_allclose(
        table[0, ..., k],
        (oracle["landfr"][0] + oracle["landfr"][12]) / 2,
        rtol=1e-6,
    )


def test_merge_matches_pandas_left_merge(tmp_path):
    """merge_monthly == cell 32-34: df1 (high-frequency rows) left-merged
    with df2 (monthly rows) on (lat, lon, month)."""
    root = str(tmp_path / "ma3")
    write_monthly_fixture(root, months=12, H=3, W=4)
    months, fields = load_monthly_attrs(root)
    table = monthly_climatology(months, fields)

    # a high-frequency no-leap time axis spanning three months
    times = pd.date_range("1950-01-30", periods=40, freq="D")
    midx = month_index(times)
    merged = np.asarray(merge_monthly(table, midx))
    assert merged.shape == (40, 3, 4, len(MONTHLY_ATTRIBUTES))

    # pandas oracle, exactly as the notebook builds it
    H, W = 3, 4
    lats, lons = np.arange(H), np.arange(W)
    attr = "wtbl_depth"
    df1 = pd.DataFrame(
        [(la, lo, t) for t in times for la in lats for lo in lons],
        columns=["lat", "lon", "time"],
    )
    df1["month"] = df1["time"].dt.month
    df2 = pd.DataFrame(
        [
            (la, lo, m, fields[attr][m - 1, la, lo])
            for m in months for la in lats for lo in lons
        ],
        columns=["lat", "lon", "month", attr],
    )
    df = pd.merge(df1, df2, on=["lat", "lon", "month"], how="left")
    k = MONTHLY_ATTRIBUTES.index(attr)
    got = merged[..., k].reshape(len(times), H * W)
    want = df[attr].to_numpy(np.float32).reshape(len(times), H * W)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_merge_channel_subset_and_missing_month(tmp_path):
    root = str(tmp_path / "ma4")
    write_monthly_fixture(root, months=3, H=2, W=2)  # Jan-Mar only
    months, fields = load_monthly_attrs(root)
    table = monthly_climatology(months, fields)
    assert np.isnan(table[11]).all()  # December never observed -> NaN
    sub = np.asarray(merge_monthly(table, np.array([0, 2]), channels=[0, 4]))
    assert sub.shape == (2, 2, 2, 2)
    np.testing.assert_allclose(sub[1, ..., 1], table[2, ..., 4])


def test_netcdf4_monthly_tree(tmp_path):
    """The monthly loader over an HDF5 tree (raw fractional-year coord
    survives the h5 writer's dimension-scale path)."""
    root = str(tmp_path / "ma5")
    oracle = write_monthly_fixture(root, months=2, H=3, W=3, fmt="netcdf4")
    months, fields = load_monthly_attrs(root)
    assert list(months) == [1, 2]
    np.testing.assert_array_equal(fields["axyp"], oracle["axyp"])
