"""Shared helpers for subprocess CLI round-trip tests."""

import os
import subprocess
import sys


def cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def run(cmd, env):
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                         env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    return out


def train_tiny_snapshot(snap, *, model="LSTM-tiny", extra=()):
    """One-epoch tiny synthetic training run -> snapshot dir ``snap``."""
    run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.train",
            "--model", model, "--hidden-channels", "4",
            "--kernel-size", "3", "--num-layers", "1",
            "--sequence-length", "3", "--num-epochs", "1",
            "--batch-size", "4", "--input-size", "20", "28",
            "--synthetic-steps", "60", "--synthetic-grid", "16", "24",
            "--snapshot-dir", snap, "--checkpoint-every", "1",
            *extra,
        ],
        cpu_env(),
    )
    return snap
