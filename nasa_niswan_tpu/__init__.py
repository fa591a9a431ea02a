"""nasa_niswan_tpu: a TPU-native framework for Smart NINT aerosol-transport emulation.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
smhassanerfani/nasa-niswan (PyTorch, single GPU): ML emulation of
Non-Interactive Tracer (NINT) transport inside the NASA GISS ModelE
Earth-System Model.

Layering (bottom-up):
  core/      lat-lon grid spec + geophysical padding (cyclic lon, reflective lat)
  ops/       Pallas TPU kernels for the hot compute path (fused ConvLSTM cell)
  models/    ConvLSTM / UNet / pix2pix architectures as pure-functional JAX models
  data/      ModelE data catalog, normalization, windowing, host pipeline, fixtures
  train/     jitted train/eval steps, optax optimizers, checkpointing, config CLI
  rollout/   compiled autoregressive rollout (the serving mode) + sensitivity tools
  parallel/  device-mesh sharding: DP over batch, spatial sharding with halo exchange
  evalx/     metrics (R^2 family, Pearson, exceedance) and reporting
"""

__version__ = "0.1.0"

from nasa_niswan_tpu.core.grid import GridSpec, MODELE_2x2P5
from nasa_niswan_tpu.core.padding import pad_geo, pad_cyclic_lon, pad_reflect_lat
