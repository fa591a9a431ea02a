"""netCDF-tree-backed loaders for real ModelE output (requires xarray).

Implements the lazy daily-file datasets of the reference — E33OMA
(dataset.py:125-298) and E33OMA_CRNN (dataset.py:403-548) — plus the
recommended TPU-rate ingestion path: ``pack_to_npz`` converts a year of
daily netCDF files into one packed array file once, after which training
uses the in-memory ``SequenceDataset``/``SingleStepDataset`` (opening 2-5
netCDF files per sample, as the reference does in its __getitem__ hot path
at dataset.py:446-454, is orders of magnitude too slow to feed a TPU).

This module is import-gated: everything raises a clear error if xarray is
unavailable (it is not part of the baked TPU image).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional, Tuple

import numpy as np

from nasa_niswan_tpu.data.catalog import FILE_FAMILIES, SPECIES_VARS, daily_filename
from nasa_niswan_tpu.data.statistics import species_stats

try:  # pragma: no cover - exercised only where xarray is installed
    import xarray as xr

    HAVE_XARRAY = True
except ImportError:  # pragma: no cover
    xr = None
    HAVE_XARRAY = False


def _require_xarray():
    if not HAVE_XARRAY:
        raise ImportError(
            "xarray is required for netCDF ingestion; install the [data] extra "
            "or pre-pack the data with pack_to_npz on a machine that has it"
        )


def list_velocity_files(root: str) -> List[str]:
    """All daily velocity files under ``root``, sorted by date
    (reference index build: dataset.py:136-141)."""
    out: List[str] = []
    for dirpath, _, files in os.walk(root):
        out.extend(
            osp.join(dirpath, f)
            for f in sorted(files)
            if f.split(".")[1:2] == [f"{FILE_FAMILIES['velocity']}E33oma_ai"]
        )
    return sorted(out)


def load_time_index(root: str):
    """Datetime index over the whole tree (no-leap calendar converted to
    pandas datetimes, dataset.py:144-147)."""
    _require_xarray()
    ds = xr.open_mfdataset(list_velocity_files(root))
    return ds.indexes["time"].to_datetimeindex()


def open_day(root: str, date_yyyymmdd: str, family_key: str):
    _require_xarray()
    ds = xr.open_dataset(osp.join(root, daily_filename(date_yyyymmdd, family_key)))
    ds["time"] = ds.indexes["time"].to_datetimeindex()
    return ds


def read_day_fields(
    root: str, date_yyyymmdd: str, species: str, *, levels: int | None = None
) -> Dict[str, np.ndarray]:
    """Read one day of all model inputs/targets into numpy arrays.

    levels=None -> surface only (reference isel(level=0), dataset.py:178-180);
    levels=k -> first k vertical levels (the 20-level fusion config).
    """
    sv = SPECIES_VARS[species]
    lev = (lambda da: da.isel(level=0)) if levels is None else (
        lambda da: da.isel(level=slice(0, levels))
    )
    vel = open_day(root, date_yyyymmdd, "velocity")
    pre = open_day(root, date_yyyymmdd, "precip")
    src = open_day(root, date_yyyymmdd, sv.src_family)
    trc = open_day(root, date_yyyymmdd, "tracer_conc")
    return {
        "u": lev(vel["u"]).values.astype(np.float32),
        "v": lev(vel["v"]).values.astype(np.float32),
        "omega": lev(vel["omega"]).values.astype(np.float32),
        "prec": pre["prec"].values.astype(np.float32),
        "src": src[sv.src_var].values.astype(np.float32),
        "conc": lev(trc[sv.conc_var]).values.astype(np.float32),
    }


def pack_to_npz(
    root: str,
    out_path: str,
    species: str = "bcb",
    *,
    dates: Optional[List[str]] = None,
    levels: int | None = None,
) -> str:
    """Offline packing: daily netCDF tree -> one compressed npz slab keyed
    like the synthetic fixture (u, v, omega, prec, {species}_src/_conc).

    Run once per species; the packed file feeds SequenceDataset directly.
    """
    _require_xarray()
    if dates is None:
        index = load_time_index(root)
        dates = sorted({t.strftime("%Y%m%d") for t in index})
    fields: Dict[str, List[np.ndarray]] = {k: [] for k in ("u", "v", "omega", "prec", "src", "conc")}
    for d in dates:
        day = read_day_fields(root, d, species, levels=levels)
        for k, v in day.items():
            fields[k].append(v)
    packed = {k: np.concatenate(v, axis=0) for k, v in fields.items()}
    np.savez_compressed(
        out_path,
        u=packed["u"],
        v=packed["v"],
        omega=packed["omega"],
        prec=packed["prec"],
        **{f"{species}_src": packed["src"], f"{species}_conc": packed["conc"]},
    )
    return out_path


def load_static_attrs(path: str, *, exclude_prefix: str = "lai") -> np.ndarray:
    """static_attrs.nc -> (C, H, W) array, excluding ``lai_*`` variables
    (reference add_static_attributes, dataset.py:100-111)."""
    _require_xarray()
    ds = xr.open_dataset(path)
    chans = [
        da.values
        for name, da in ds.data_vars.items()
        if name.split("_")[0] != exclude_prefix
    ]
    return np.asarray(chans, dtype=np.float32)


def json_normalizer(species: str, *, transform: bool = False):
    """Normalizer from the shipped variable_statistics.json (the lazy
    datasets' normalization source, dataset.py:462-469)."""
    from nasa_niswan_tpu.data.dataset import Normalizer

    x_mean, x_std, y_stats = species_stats(species, transform=transform)
    return Normalizer(
        x_mean=x_mean, x_std=x_std, y_mean=y_stats.mean, y_std=y_stats.std
    )
