from nasa_niswan_tpu.evalx.metrics import (
    r2,
    r2_temporal,
    r2_spatial,
    pearson_r,
    coslat_weighted_mean,
    lat_band_weighted_r2,
    regional_slice,
    REGIONS,
    exceedance_curve,
    random_sampling,
)
