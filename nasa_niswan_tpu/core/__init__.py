from nasa_niswan_tpu.core.grid import GridSpec, MODELE_2x2P5
from nasa_niswan_tpu.core.padding import (
    pad_geo,
    pad_cyclic_lon,
    pad_reflect_lat,
    crop_to_grid,
)
