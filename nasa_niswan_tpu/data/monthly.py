"""Monthly-attributes merge (reference dataset_config.ipynb cells 29-34).

The reference prototypes (but never wires into dataset.py) a join of
monthly ModelE diagnostics onto the half-hourly training rows: it opens
the ``xaijE33oma_ai`` monthly file family with xarray, decodes the
fractional-year time axis (cell 22's ``fractional_year_to_date``), dumps
both datasets to pandas and left-merges on (lat, lon, month) — a
host-side row join that materializes every monthly value once per
high-frequency timestep.

The TPU-native design replaces the row merge with a gather: the monthly
attributes become ONE device-resident climatology table of shape
(12, H, W, K) and each training step indexes it with its month number
(``jnp.take(table, month_idx, axis=0)``) — O(1) extra memory, no host
join, fusable into the input-assembly of a jitted step.  The pandas
semantics (cells 32-34) are reproduced exactly and oracle-tested against
an actual ``pd.merge`` in tests/test_monthly_attrs.py.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# cell 30's attribute list — grid-cell area, land/ocean-ice/water/soil/
# vegetation/snow-ice fractions, water-table depth, sea-surface salinity,
# surface pressure, potential evaporation (behavioral constants).
MONTHLY_ATTRIBUTES: List[str] = [
    "axyp", "landfr", "oclkicefr", "pwatfr", "soilfr", "vsfr",
    "snowicefr", "wtbl_depth", "sss", "prsurfq", "pot_evap",
]

MONTHLY_FAMILY = "xaijE33oma_ai"


def fractional_year_to_date(fractional_year: float) -> datetime:
    """cell 22: fractional calendar year -> datetime under the 365-day
    approximation (1950.5 -> 1950-07-02 12:00)."""
    year = int(fractional_year)
    days = (fractional_year - year) * 365.0
    return datetime(year, 1, 1) + timedelta(days=days)


def load_monthly_attrs(
    root: str,
    names: Sequence[str] = tuple(MONTHLY_ATTRIBUTES),
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Read every ``*.xaijE33oma_ai.nc`` under ``root`` (sorted, the
    cell-30 walk), concatenate along time, and decode the fractional-year
    axis to month numbers.

    Returns ``(months, fields)``: months (N,) int 1..12; fields maps each
    requested attribute to its (N, H, W) array.  Uses data/ncio — no
    xarray needed, netCDF3 or netCDF4 trees alike.
    """
    from nasa_niswan_tpu.data.ncio import open_nc

    paths: List[str] = []
    for dirpath, _dirs, files in os.walk(root):
        paths += [
            os.path.join(dirpath, f)
            for f in files
            if MONTHLY_FAMILY in f and f.endswith(".nc")
        ]
    if not paths:
        raise FileNotFoundError(f"no {MONTHLY_FAMILY} files under {root}")
    months: List[int] = []
    parts: Dict[str, List[np.ndarray]] = {n: [] for n in names}
    for p in sorted(paths):
        f = open_nc(p)
        # monthly files carry a RAW fractional-year time variable (the
        # reference opens them with decode_times=False)
        tvals = np.atleast_1d(np.asarray(f["time"], np.float64))
        months += [fractional_year_to_date(v).month for v in tvals]
        for n in names:
            arr = np.asarray(f[n], np.float32)
            if arr.ndim == 2:  # single-record file without a time dim
                arr = arr[None]
            parts[n].append(arr)
    fields = {n: np.concatenate(parts[n], axis=0) for n in names}
    return np.asarray(months, np.int32), fields


def monthly_climatology(
    months: np.ndarray, fields: Dict[str, np.ndarray]
) -> np.ndarray:
    """(months, per-attr (N, H, W)) -> one (12, H, W, K) table, averaging
    records that share a calendar month (multi-year trees).  Months with
    no record hold NaN — indexing one is a data-coverage bug upstream and
    should surface, not silently zero."""
    names = list(fields)
    N, H, W = fields[names[0]].shape
    table = np.full((12, H, W, len(names)), np.nan, np.float32)
    for m in range(1, 13):
        sel = months == m
        if sel.any():
            for k, n in enumerate(names):
                table[m - 1, ..., k] = fields[n][sel].mean(axis=0)
    return table


def month_index(time_index) -> np.ndarray:
    """Per-step 0-based month index from a DatetimeIndex-like sequence of
    timestamps (the high-frequency axis of cell 32's ``df1['month']``)."""
    return np.asarray([t.month - 1 for t in time_index], np.int32)


def merge_monthly(
    table: np.ndarray, month_idx, *, channels: Optional[Sequence[int]] = None
):
    """The merge itself (cell 34's ``pd.merge(..., on=['lat','lon','month'],
    how='left')``), as a device gather: for each step t, the attribute
    frame is ``table[month_idx[t]]``.

    table (12, H, W, K); month_idx (T,) 0-based.  Returns (T, H, W, K)
    (or the selected ``channels`` subset) — jit/scan-friendly: under a
    scan, pass ``table`` as a carry-free closure constant and gather one
    step at a time; XLA keeps the table resident in HBM.
    """
    import jax.numpy as jnp

    tab = jnp.asarray(table)
    if channels is not None:
        tab = tab[..., tuple(channels)]
    return jnp.take(tab, jnp.asarray(month_idx, np.int32), axis=0)
