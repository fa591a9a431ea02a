"""Evaluation metrics — the reference's acceptance criteria, in jnp.

Every definition is bit-compatible with the reference implementation (they
are golden-tested against sklearn/scipy in tests/test_metrics.py):

  r2            sklearn r2_score on flattened arrays (train.py:114)
  r2_temporal   per-timestep R^2 over flattened maps (test.ipynb cell 12)
  r2_spatial    per-gridpoint R^2 over time, 1 - ss_res/ss_tot (cell 16)
  pearson_r     scipy.stats.pearsonr statistic (cell 22)
  cos-lat weighted means and GT-weighted band-averaged R^2 (cells 22-24, 44)
  regional boxes (cell 38) and exceedance curves (Weibull, cell 29)

Implemented with jnp so training/eval metrics run on device with no
per-batch host sync (the reference syncs every batch at train.py:114).
All functions accept numpy or jax arrays.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

# Unit conversion used by the reference evaluation (test.ipynb cell 17):
# ModelE mixing ratios in 1e-2 kg/kg -> ug/kg display units.
KGKG_TO_UGKG = 0.01

# Named evaluation regions (test.ipynb cell 38), degrees: (lat_lo, lat_hi),
# (lon_lo, lon_hi) in [-180, 180).
REGIONS: Dict[str, Dict[str, Tuple[float, float]]] = {
    "Amazon": {"lat": (-15.0, 5.0), "lon": (-75.0, -45.0)},
    "North Africa": {"lat": (10.0, 30.0), "lon": (-20.0, 50.0)},
    "Central Africa": {"lat": (-20.0, 10.0), "lon": (10.0, 40.0)},
    "Indonesia": {"lat": (-10.0, 10.0), "lon": (95.0, 140.0)},
    "Siberia": {"lat": (50.0, 70.0), "lon": (60.0, 130.0)},
    "Northern Canada": {"lat": (50.0, 70.0), "lon": (-140.0, -60.0)},
    "Atlantic Ocean": {"lat": (-20.0, 10.0), "lon": (-40.0, 10.0)},
    "Pacific Ocean": {"lat": (-20.0, 10.0), "lon": (-180.0, -80.0)},
}


def r2(y_true, y_pred) -> jnp.ndarray:
    """Coefficient of determination on flattened inputs (sklearn r2_score
    semantics: residuals vs variance around the true mean)."""
    y_true = jnp.ravel(jnp.asarray(y_true))
    y_pred = jnp.ravel(jnp.asarray(y_pred))
    ss_res = jnp.sum((y_true - y_pred) ** 2)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true)) ** 2)
    return 1.0 - ss_res / ss_tot


def r2_temporal(y_true, y_pred) -> jnp.ndarray:
    """Per-timestep R^2: axis 0 is time, each step's map flattened
    (test.ipynb cell 12).  Returns (T,)."""
    y_true = jnp.asarray(y_true).reshape(y_true.shape[0], -1)
    y_pred = jnp.asarray(y_pred).reshape(y_pred.shape[0], -1)
    ss_res = jnp.sum((y_true - y_pred) ** 2, axis=1)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true, axis=1, keepdims=True)) ** 2, axis=1)
    return 1.0 - ss_res / ss_tot


def r2_spatial(y_true, y_pred) -> jnp.ndarray:
    """Per-gridpoint R^2 over time (test.ipynb cell 16).  Input (T, ..., H, W),
    reduces axis 0; returns (..., H, W)."""
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    ss_res = jnp.sum((y_true - y_pred) ** 2, axis=0)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true, axis=0)) ** 2, axis=0)
    return 1.0 - ss_res / ss_tot


def pearson_r(a, b) -> jnp.ndarray:
    a = jnp.ravel(jnp.asarray(a))
    b = jnp.ravel(jnp.asarray(b))
    a = a - jnp.mean(a)
    b = b - jnp.mean(b)
    return jnp.sum(a * b) / jnp.sqrt(jnp.sum(a * a) * jnp.sum(b * b))


def coslat_weighted_mean(field, lat, *, lat_axis: int = -2, also_lon: bool = False):
    """cos(lat)-weighted mean over latitude (and optionally longitude),
    matching xarray's .weighted(cos(lat)).mean() (test.ipynb cells 22-24)."""
    field = jnp.asarray(field)
    w = jnp.cos(jnp.deg2rad(jnp.asarray(lat)))
    shape = [1] * field.ndim
    shape[lat_axis] = -1
    wb = w.reshape(shape)
    num = jnp.sum(field * wb, axis=lat_axis)
    den = jnp.sum(jnp.broadcast_to(wb, field.shape), axis=lat_axis)
    out = num / den
    if also_lon:
        out = jnp.mean(out, axis=-1)
    return out


def lat_band_weighted_r2(
    r2_map, weight_map, lat, band: Tuple[float, float]
) -> jnp.ndarray:
    """GT-magnitude-weighted mean R^2 over a latitude band (test.ipynb cell
    44: weight = time-mean ground truth; band average = sum(w*r2)/sum(w))."""
    lat = np.asarray(lat)
    sel = (lat >= band[0]) & (lat <= band[1])
    r2_map = jnp.asarray(r2_map)[..., sel, :]
    weight_map = jnp.asarray(weight_map)[..., sel, :]
    return jnp.sum(weight_map * r2_map) / jnp.sum(weight_map)


def regional_slice(field, lat, lon, region: str):
    """Slice (..., lat, lon) to a named region box (test.ipynb cells 38-40)."""
    box = REGIONS[region]
    lat = np.asarray(lat)
    lon = np.asarray(lon)
    lat_sel = (lat >= box["lat"][0]) & (lat <= box["lat"][1])
    lon_sel = (lon >= box["lon"][0]) & (lon <= box["lon"][1])
    return jnp.asarray(field)[..., lat_sel, :][..., lon_sel]


def exceedance_curve(values) -> Tuple[np.ndarray, np.ndarray]:
    """Weibull plotting-position exceedance probabilities (test.ipynb cell
    29): values sorted descending, ep_i = 100 * i / (n + 1)."""
    v = -np.sort(-np.asarray(values).ravel())
    ep = 100.0 * np.arange(1, len(v) + 1) / (len(v) + 1)
    return v, ep


def random_sampling(data, n_samples: int = 10000, seed: int = 48) -> np.ndarray:
    """Deterministic flat subsample (test.ipynb cell 27)."""
    flat = np.asarray(data).ravel()
    idx = np.arange(flat.size)
    np.random.default_rng(seed).shuffle(idx)
    return flat[idx[:n_samples]]
