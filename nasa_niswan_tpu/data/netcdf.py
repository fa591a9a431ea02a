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


class LazyE33OMASingleStep:
    """Lazy daily-netCDF single-step dataset (E33OMA semantics,
    dataset.py:125-298): deterministic shuffled 70/30 train/val split over
    the first model year (12,264 / 5,256 of 17,520 half-hour steps), test =
    all of year 2; per sample opens the day's files, extracts surface
    u/v/omega/prec + species source + target + previous-step concentration
    (the 6-channel feedback mode), normalizes from the shipped statistics
    JSON (set2 in log10 mode), pads geophysically.

    Serving raw netCDF per sample cannot feed a TPU (SURVEY.md §7 "hard
    parts") — use pack_to_npz once and the in-memory datasets for training;
    this class exists for parity validation on machines with the real data
    tree.
    """

    def __init__(
        self,
        root: str,
        *,
        period: str,
        species: str = "bcb",
        in_channels: int = 5,
        transform: bool = False,
        padding: Optional[Tuple[int, int]] = (100, 154),
        train_frac: float = 0.7,
        seed: int = 0,
    ):
        _require_xarray()
        self.root = root
        self.species = species
        self.in_channels = in_channels
        self.transform = transform
        self.padding = padding

        index = load_time_index(root)
        n = len(index) // 2  # first year
        # pairs (t, t-1): inputs/targets at t, feedback at t-1
        # (dataset.py:146-147 drops the first/last step)
        cur = index[1:]
        prev = index[:-1]
        order = np.arange(n)
        np.random.default_rng(seed).shuffle(order)
        n_train = int(n * train_frac)
        if period == "train":
            sel = order[:n_train]
        elif period == "val":
            sel = order[n_train:]
        elif period == "test":
            sel = np.arange(n, len(cur))
        else:
            raise ValueError(f"bad period {period!r}")
        self.times = cur[sel]
        self.prev_times = prev[sel]
        self.normalizer = json_normalizer(species, transform=transform)
        from nasa_niswan_tpu.data.statistics import species_stats

        _, _, y_stats = species_stats(species, transform=transform)
        self.y_mean, self.y_std = y_stats.mean, y_stats.std

    def __len__(self) -> int:
        return len(self.times)

    def __getitem__(self, i: int):
        from nasa_niswan_tpu.core.padding import pad_geo
        from nasa_niswan_tpu.data.dataset import masked_log10

        t = self.times[i]
        day = t.strftime("%Y%m%d")
        fields = read_day_fields(self.root, day, self.species)
        ti = int(np.argmin(np.abs(
            open_day(self.root, day, "velocity").indexes["time"] - t
        )))
        chans = [fields[k][ti] for k in ("u", "v", "omega", "prec", "src")]
        y = fields["conc"][ti]
        if self.in_channels == 6:
            tp = self.prev_times[i]
            pday = tp.strftime("%Y%m%d")
            pfields = (
                fields if pday == day
                else read_day_fields(self.root, pday, self.species)
            )
            pi = int(np.argmin(np.abs(
                open_day(self.root, pday, "velocity").indexes["time"] - tp
            )))
            chans.append(pfields["conc"][pi])
        x = np.stack(chans).astype(np.float32)
        if self.transform:
            x = masked_log10(x)
            y = masked_log10(y)
        norm = self.normalizer
        x_mean = norm.x_mean
        x_std = norm.x_std
        if self.in_channels == 6:
            x_mean = np.concatenate([x_mean, [self.y_mean]])
            x_std = np.concatenate([x_std, [self.y_std]])
        x = (x - x_mean.reshape(-1, 1, 1)) / x_std.reshape(-1, 1, 1)
        y = (y - self.y_mean) / self.y_std
        if self.padding:
            x = np.asarray(pad_geo(x, self.padding))
        return x.astype(np.float32), y.astype(np.float32)


class LazyE33OMASequence:
    """Lazy daily-netCDF sequence dataset (E33OMA_CRNN semantics,
    dataset.py:403-548): sliding windows over the full two-year index,
    train = year 1 (17,520 windows), val = next 10%, test = the rest;
    target at window end; stats from the shipped JSON (set1)."""

    def __init__(
        self,
        root: str,
        *,
        period: str,
        species: str = "bcb",
        sequence_length: int = 48,
        in_channels: int = 5,
        padding: Optional[Tuple[int, int]] = (100, 154),
        static_attrs_path: Optional[str] = None,
    ):
        _require_xarray()
        self.root = root
        self.species = species
        self.seq_len = sequence_length
        self.in_channels = in_channels
        self.padding = padding

        index = load_time_index(root)
        windows = [
            index[i : i + sequence_length]
            for i in range(len(index) - sequence_length + 1)
        ]
        targets = index[sequence_length - 1 :]
        year = 17520 if len(targets) >= 17520 else int(len(targets) * 0.5)
        tenth = int(year * 0.1)
        sel = {
            "train": slice(0, year),
            "val": slice(year, year + tenth),
            "test": slice(year + tenth, None),
        }[period]
        self.windows = windows[sel]
        self.targets = targets[sel]
        self.normalizer = json_normalizer(species)
        from nasa_niswan_tpu.data.statistics import species_stats

        _, _, y_stats = species_stats(species)
        self.y_mean, self.y_std = y_stats.mean, y_stats.std
        n_static = in_channels - 5
        if n_static > 0:
            if static_attrs_path is None:
                raise ValueError("static channels requested without attrs path")
            from nasa_niswan_tpu.data.dataset import zscore_static

            self.static = zscore_static(
                load_static_attrs(static_attrs_path)[:n_static]
            )
        else:
            self.static = None

    def __len__(self) -> int:
        return len(self.targets)

    def __getitem__(self, i: int):
        from nasa_niswan_tpu.core.padding import pad_geo

        window = self.windows[i]
        days = sorted({t.strftime("%Y%m%d") for t in window})
        per_day = {d: read_day_fields(self.root, d, self.species) for d in days}
        day_times = {
            d: open_day(self.root, d, "velocity").indexes["time"] for d in days
        }
        frames = []
        for t in window:
            d = t.strftime("%Y%m%d")
            ti = int(np.argmin(np.abs(day_times[d] - t)))
            f = per_day[d]
            frames.append(
                np.stack([f[k][ti] for k in ("u", "v", "omega", "prec", "src")])
            )
        x = np.stack(frames).astype(np.float32)  # (T, 5, H, W)
        td = self.targets[i].strftime("%Y%m%d")
        tti = int(np.argmin(np.abs(day_times[td] - self.targets[i])))
        y = per_day[td]["conc"][tti].astype(np.float32)

        norm = self.normalizer
        x = (x - norm.x_mean.reshape(1, -1, 1, 1)) / norm.x_std.reshape(1, -1, 1, 1)
        y = (y - self.y_mean) / self.y_std
        if self.static is not None:
            tiled = np.broadcast_to(
                self.static[None], (x.shape[0], *self.static.shape)
            )
            x = np.concatenate([x, tiled], axis=1)
        if self.padding:
            x = np.asarray(pad_geo(x, self.padding))
        return x.astype(np.float32), y.astype(np.float32)


def build_static_attrs(
    land_cover_path: str,
    lai_path: str,
    grid_attrs_path: str,
    out_path: str,
    *,
    drop_all_zero: bool = True,
) -> str:
    """Offline static_attrs.nc builder (dataset_config.ipynb cells 22-28):
    merges land-cover class fractions (dropping all-zero classes), LAI
    variables renamed ``lai_*``, and grid attributes (axyp/landfr/ocnfr)
    into one netCDF consumed by the static-channel loaders."""
    _require_xarray()
    lc = xr.open_dataset(land_cover_path)
    if drop_all_zero:
        keep = [v for v in lc.data_vars if float(np.abs(lc[v]).sum()) > 0]
        lc = lc[keep]
    lai = xr.open_dataset(lai_path)
    lai = lai.rename({v: f"lai_{v}" for v in lai.data_vars})
    grid = xr.open_dataset(grid_attrs_path)
    keep = [v for v in ("axyp", "landfr", "ocnfr") if v in grid]
    merged = xr.merge([lc, lai, grid[keep]])
    merged.to_netcdf(out_path)
    return out_path


def json_normalizer(species: str, *, transform: bool = False):
    """Normalizer from the shipped variable_statistics.json (the lazy
    datasets' normalization source, dataset.py:462-469)."""
    from nasa_niswan_tpu.data.dataset import Normalizer

    x_mean, x_std, y_stats = species_stats(species, transform=transform)
    return Normalizer(
        x_mean=x_mean, x_std=x_std, y_mean=y_stats.mean, y_std=y_stats.std
    )
