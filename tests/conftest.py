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


@pytest.fixture(scope="session")
def canonical_snap(tmp_path_factory):
    """One tiny canonical (config #1) training snapshot, shared by every
    CLI test that only needs *a* surface snapshot — each subprocess train
    run costs ~12 s of the suite, so identical ones train once."""
    from cli_utils import train_tiny_snapshot

    snap = str(tmp_path_factory.mktemp("clisnap") / "snap")
    return train_tiny_snapshot(snap, model="LSTM-clisnap")


@pytest.fixture(scope="session")
def seq2seq_snap(tmp_path_factory):
    """One tiny seq2seq (config #3) snapshot, shared across CLI tests."""
    from cli_utils import train_tiny_snapshot

    snap = str(tmp_path_factory.mktemp("clisnap-s2s") / "snap")
    return train_tiny_snapshot(
        snap, model="LSTM-clisnap-s2s", extra=("--mode", "seq2seq")
    )


@pytest.fixture(scope="session")
def unet6_snap(tmp_path_factory):
    """One tiny UNet-6ch feedback snapshot (test.ipynb cell 8's
    autoregressive-emulation config), shared across CLI tests."""
    import sys

    from cli_utils import cpu_env, run

    snap = str(tmp_path_factory.mktemp("clisnap-u6") / "snap")
    run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.train",
            "--model", "UNet-clisnap", "--in-channels", "6",
            "--unet-features", "4", "8", "16", "32",
            "--num-epochs", "1", "--batch-size", "8",
            "--input-size", "32", "48", "--synthetic-steps", "60",
            "--synthetic-grid", "16", "24", "--snapshot-dir", snap,
            "--checkpoint-every", "1",
        ],
        cpu_env(),
    )
    return snap
