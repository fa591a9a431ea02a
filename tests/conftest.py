"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is not available in CI; all sharding/collective
code is validated on XLA's host-platform device simulation, which compiles
and executes the same SPMD programs.
"""

import os

# Must be set before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
