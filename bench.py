"""Benchmark: sustained autoregressive rollout throughput on TPU.

The north-star metric (BASELINE.json): emulated model-days/min at
90x144x20 — the 20-level 3-D fusion config (4 meteorology variables x 20
vertical levels + 1 surface emission = 81 input channels) driving the
canonical ConvLSTM emulator (hidden 64/32/16, kernels 5/3/3), run as a
single compiled state-carrying rollout (rollout/autoregressive.py), bf16
compute.  Target >= 1000 days/min; reference GPU anchor for the *surface*
model is ~1550 forward-only days/min at batch 1 (test.ipynb cell 59).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _preflight(timeout_s: float = 180.0) -> None:
    """Fail fast (instead of hanging the harness) if the TPU worker is
    unreachable — a tiny computation must materialize within the timeout."""
    import threading

    ok = threading.Event()

    def probe():
        import jax.numpy as jnp

        np.asarray(jnp.ones(1) + 1)
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        import sys

        print("bench preflight failed: device did not respond", file=sys.stderr)
        raise SystemExit(1)


def main():
    import jax

    _preflight()

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
    from nasa_niswan_tpu.rollout.autoregressive import (
        make_rollout_fn,
        model_days_per_min,
    )

    LEVELS = 20
    # the framework's canonical 20-level fusion layout (data/fusion.py;
    # config #2): u/v/omega per level + prec + surface emission.  (Round 1
    # benchmarked a 4L+1=81-channel superset; the canonical definition is
    # C=62 — see fusion_channel_count.)
    C = 3 * LEVELS + 2
    BATCH = 1
    STEPS = 384  # 8 emulated model-days per call: long enough to amortize
    # the fixed per-launch cost (~29 ms through the dev tunnel) and measure
    # the sustained scan rate (~0.46 ms/step marginal on v5e)
    PADDED = (100, 154)
    GRID = (90, 144)

    cfg = ConvLSTMConfig(
        in_channels=C,
        hidden_channels=(64, 32, 16),
        kernel_sizes=(5, 3, 3),
        compute_dtype="bfloat16",
    )
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        x_mean=np.zeros(C, np.float32),
        x_std=np.ones(C, np.float32),
        y_mean=0.0,
        y_std=1.0,
    )
    rollout = make_rollout_fn(cfg, norm, padded_shape=PADDED, grid_shape=GRID)

    rng = np.random.default_rng(0)
    # device-resident forcings: this benchmark measures sustained rollout
    # compute; production streaming double-buffers H2D behind the scan
    # (data/pipeline.device_prefetch)
    import jax.numpy as jnp

    forcings = jnp.asarray(
        rng.standard_normal((BATCH, STEPS, C, *GRID)).astype(np.float32)
    )

    # warmup / compile (np.asarray forces a real device->host sync; under
    # the axon tunnel jax.block_until_ready may return early)
    preds, state = rollout(params, forcings)
    np.asarray(preds[0, -1])

    n_rep = 3
    tic = time.perf_counter()
    for _ in range(n_rep):
        preds, state = rollout(params, forcings)
        np.asarray(preds[0, -1])  # sync on the last step's map only
    elapsed = (time.perf_counter() - tic) / n_rep

    value = model_days_per_min(STEPS, elapsed, batch=BATCH)
    print(
        json.dumps(
            {
                "metric": "autoregressive rollout throughput, 90x144x20 (62ch fusion) ConvLSTM, bf16, batch 1",
                "value": round(value, 2),
                "unit": "model-days/min",
                "vs_baseline": round(value / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
