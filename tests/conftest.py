"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is not available in CI; all sharding/collective
code is validated on XLA's host-platform device simulation, which compiles
and executes the same SPMD programs.

Note: the TPU environment may pre-register an accelerator PJRT plugin at
interpreter startup (ignoring JAX_PLATFORMS env set later), so we override
the platform through jax.config before any backend initializes.
"""

import os

# Must be set before jax initializes its backends.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert jax.device_count() == 8

# Persistent compile cache: the suite is compile-bound on a 1-core host
# (a small UNet graph alone costs ~1 min of XLA CPU compilation), and CI
# reruns recompile identical programs.  No remote-compile tunnel on the
# CPU backend, so the low threshold is safe (cf. utils/cache.py note).
from nasa_niswan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(min_compile_secs=0.5)
# subprocess CLI tests (train/evalx round trips, multihost workers)
# inherit the low threshold through the environment
os.environ.setdefault("NISWAN_COMPILE_CACHE_MIN_S", "0.5")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
