from nasa_niswan_tpu.parallel.mesh import make_mesh, replicated, batch_sharded
from nasa_niswan_tpu.parallel.halo import (
    halo_exchange_zero,
    halo_exchange_geo,
    sharded_conv2d,
)
