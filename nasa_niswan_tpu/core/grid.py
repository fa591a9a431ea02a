"""Lat-lon grid specification for the ModelE 2 x 2.5 degree grid.

The reference operates on a fixed 90 (lat) x 144 (lon) grid, 30-minute
timestep -> 48 steps/day (reference: dataset.py:146-151, README.md).  The grid
is a first-class object here because the padded input size, the output crop
offsets, the cos-lat metric weights, and the spatial-sharding halo logic all
derive from it.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """A global regular lat-lon grid.

    Attributes:
      nlat: number of latitude rows (grid boxes pole to pole).
      nlon: number of longitude columns (wraps cyclically).
      nlev: number of vertical levels carried by the model (1 = surface-only,
        matching the reference snapshot; 20 = the paper's 3-D fusion config).
      steps_per_day: model timesteps per day (reference: 30-min -> 48).
    """

    nlat: int = 90
    nlon: int = 144
    nlev: int = 1
    steps_per_day: int = 48

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nlat, self.nlon)

    @property
    def lat(self) -> np.ndarray:
        """Latitude box centers in degrees, south to north."""
        dlat = 180.0 / self.nlat
        return np.linspace(-90.0 + dlat / 2, 90.0 - dlat / 2, self.nlat)

    @property
    def lon(self) -> np.ndarray:
        """Longitude box centers in degrees in [-180, 180)."""
        dlon = 360.0 / self.nlon
        return np.linspace(-180.0 + dlon / 2, 180.0 - dlon / 2, self.nlon)

    def coslat_weights(self) -> np.ndarray:
        """cos(latitude) area weights, shape (nlat,).

        Matches the zonal-mean weighting used by the reference evaluation
        (test.ipynb cell 44: np.cos(np.deg2rad(lat))).
        """
        return np.cos(np.deg2rad(self.lat))

    def padded_shape(self, pad_lat: int, pad_lon: int) -> Tuple[int, int]:
        return (self.nlat + 2 * pad_lat, self.nlon + 2 * pad_lon)

    def crop_offsets(self, padded: Tuple[int, int]) -> Tuple[int, int]:
        """Offsets of the physical grid inside a padded array.

        The reference pads symmetrically: offset = (padded - grid) // 2
        (dataset.py:27-28, 42-43), and training crops the model output back
        with exactly these offsets (train.py:99-102: UNet 256x256 -> [83:173,
        56:200]; ConvLSTM 100x154 -> [5:95, 5:149]).
        """
        return ((padded[0] - self.nlat) // 2, (padded[1] - self.nlon) // 2)


MODELE_2x2P5 = GridSpec(nlat=90, nlon=144, nlev=1, steps_per_day=48)
MODELE_2x2P5_L20 = GridSpec(nlat=90, nlon=144, nlev=20, steps_per_day=48)
