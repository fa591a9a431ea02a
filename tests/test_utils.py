"""Utility-layer tests: profiling meters, param summary, stats tooling,
logger decorator, CLI entry (smoke)."""

import subprocess
import sys

import jax
import numpy as np
import pytest

from nasa_niswan_tpu.data.stats_tools import compute_statistics, write_statistics
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
from nasa_niswan_tpu.utils.logging import LoggerDecorator
from nasa_niswan_tpu.utils.profiling import StepTimer, device_sync, layer_summary
from nasa_niswan_tpu.utils.seeding import seed_rng


def test_layer_summary_counts_canonical():
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init

    params = convlstm_init(
        jax.random.PRNGKey(0), ConvLSTMConfig(5, (64, 32, 16), (5, 3, 3))
    )
    table = layer_summary(params)
    assert "580,305" in table  # reference total (test.ipynb cell 66)
    assert "cells" in table and "head" in table


def test_step_timer():
    import jax.numpy as jnp

    timer = StepTimer(steps_per_day=48, sync_every=2)
    x = jnp.ones(4)
    for _ in range(6):
        timer.tick(x, n_steps=48, batch=2)
    s = timer.summary()
    assert s["windows"] >= 1
    assert s["model_days_per_min"] > 0
    device_sync(x)  # smoke


def test_compute_statistics_shapes(tmp_path):
    data = synthetic_e33oma_90d(T=40, seed=7, H=12, W=16)
    stats = compute_statistics(data)
    assert set(stats) == {"set1", "set2"}
    for key in ("u", "v", "w", "prec", "bc_src", "bc_conc"):
        assert key in stats["set1"] and key in stats["set2"]
        assert stats["set1"][key]["std"] >= 0
    # log10 stats differ from raw for positive-valued fields
    assert stats["set2"]["bc_conc"]["mean"] != stats["set1"]["bc_conc"]["mean"]
    p = write_statistics(stats, str(tmp_path / "vs.json"))
    import json

    assert json.load(open(p))["set1"]["u"] == stats["set1"]["u"]


def test_logger_decorator(tmp_path):
    log = tmp_path / "run.log"

    @LoggerDecorator(str(log))
    def job(a, b=2):
        return a + b

    assert job(1, b=3) == 4
    text = log.read_text()
    assert "Run configuration" in text and "Elapsed time" in text


def test_seed_rng_deterministic():
    k1 = seed_rng(0)
    a = np.random.rand(3)
    k2 = seed_rng(0)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_cli_end_to_end(tmp_path):
    """python -m nasa_niswan_tpu.train on the synthetic fixture (tiny run):
    writes configurations.json, logger.log, logger.npy, checkpoints."""
    snap = tmp_path / "snap"
    cmd = [
        sys.executable, "-m", "nasa_niswan_tpu.train",
        "--model", "LSTM-cli-test", "--hidden-channels", "4",
        "--kernel-size", "3", "--num-layers", "1", "--sequence-length", "3",
        "--num-epochs", "1", "--batch-size", "4", "--input-size", "20", "28",
        "--synthetic-steps", "40", "--synthetic-grid", "16", "24",
        "--snapshot-dir", str(snap),
        "--checkpoint-every", "1", "--learning-rate", "1e-3",
    ]
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU in the subprocess
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                         env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert (snap / "configurations.json").exists()
    assert (snap / "logger.npy").exists()
    assert (snap / "logger.log").exists()
    assert (snap / "epoch-001").is_dir()
    assert "Epoch: 1" in out.stdout


def test_compilation_cache_roundtrip(tmp_path, monkeypatch):
    """enable_compilation_cache persists compiled executables to disk (in a
    subprocess twice: second process must hit the cache entry written by
    the first) and honors the opt-out env var."""
    import subprocess
    import sys

    from nasa_niswan_tpu.utils.cache import enable_compilation_cache

    monkeypatch.setenv("NISWAN_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path / "never")) is None

    monkeypatch.delenv("NISWAN_NO_COMPILE_CACHE")
    cache = tmp_path / "xla"
    code = f"""
import os, sys
os.environ.pop("NISWAN_NO_COMPILE_CACHE", None)
os.environ["XLA_FLAGS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")
from nasa_niswan_tpu.utils.cache import enable_compilation_cache
d = enable_compilation_cache({str(cache)!r}, min_compile_secs=0.0)
assert d == {str(cache)!r}, d
import jax.numpy as jnp, numpy as np
x = jnp.arange(12.0).reshape(3, 4)
print(float(jax.jit(lambda a: jnp.tanh(a @ a.T).sum())(x)))
"""
    import os

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for _ in range(2):
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=240, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr[-500:]
    assert len(list(cache.iterdir())) >= 1  # an executable persisted
