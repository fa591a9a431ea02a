"""Benchmark: sustained autoregressive rollout throughput on TPU.

The north-star metric (BASELINE.json): emulated model-days/min at
90x144x20 — the 20-level 3-D fusion config (C = 3*20+2 = 62 channels,
data/fusion.py) driving the canonical ConvLSTM emulator (hidden 64/32/16,
kernels 5/3/3), run as a single compiled state-carrying rollout
(rollout/autoregressive.py), bf16 compute.  Target >= 1000 days/min;
reference GPU anchor for the *surface* model is ~1550 forward-only
days/min at batch 1 (test.ipynb cell 59).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``--train`` instead benchmarks end-to-end canonical TRAINING throughput
(launcher.sh config: bs 8, T=48, 100x154 padded, 8 channels, bf16+remat)
including the async host pipeline, and reports the input-wait share so
input-boundedness is measured, not assumed (SURVEY §7 "host data pipeline
at TPU speed").
"""

from __future__ import annotations

import json
import time

import numpy as np


def _preflight(budget_s: float = 720.0) -> None:
    """Fail fast (instead of hanging the harness) if the TPU worker is
    unreachable — a tiny computation must materialize within the budget.

    One PERSISTENT probe thread, polled with exponential backoff
    (5s → 10 → 20 → ... → 120s report intervals): a healthy device
    acquires in the first ~5 s window instead of after a fixed 120 s
    join (round-4 burned 10 minutes of fixed-interval probes on a cold
    tunnel).  The 720 s total budget still covers the MEASURED ~8 min
    backend init of a cold tunnel wake.  If the probe thread dies on an
    exception it is restarted (transient tunnel drops recover).  On
    final failure exits via os._exit so interpreter teardown — which the
    axon tunnel client intermittently aborts with "FATAL: exception not
    rethrown" — never runs.  A teardown abort turns a clean rc=1 into
    rc=134 and loses the diagnostic (this ate the round-2 driver bench)."""
    import sys
    import threading

    ok = threading.Event()

    def probe():
        import jax.numpy as jnp

        np.asarray(jnp.ones(1) + 1)
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    start = time.monotonic()
    deadline = start + budget_s
    wait = 5.0
    while time.monotonic() < deadline:
        if ok.wait(min(wait, max(0.1, deadline - time.monotonic()))):
            return
        print(
            f"bench preflight: device not ready after "
            f"{time.monotonic() - start:.0f}s (budget {budget_s:.0f}s)",
            file=sys.stderr,
        )
        sys.stderr.flush()
        if not t.is_alive():  # probe died (e.g. transient drop): restart
            t = threading.Thread(target=probe, daemon=True)
            t.start()
        wait = min(wait * 2.0, 120.0)
    import os

    print("bench preflight failed: device unreachable; giving up", file=sys.stderr)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(1)  # never raise: teardown must not run on the dead tunnel


def main():
    from nasa_niswan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
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
    preds, state = rollout(params, forcings, state)  # carried-state variant
    np.asarray(preds[0, -1])

    # Sustained serving rate: chain chunks through the carried state the
    # way the decadal runner does — dispatches queue asynchronously, so
    # the fixed per-launch tunnel cost (~29 ms) is paid once per *chain*,
    # not once per chunk; sync only on the final chunk's last map.
    n_chunks, n_rep = 6, 3
    elapsed = []
    for _ in range(n_rep):
        tic = time.perf_counter()
        st = None
        for _ in range(n_chunks):
            preds, st = rollout(params, forcings, st)
        np.asarray(preds[0, -1])
        elapsed.append(time.perf_counter() - tic)

    value = model_days_per_min(
        n_chunks * STEPS, min(elapsed), batch=BATCH
    )
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


def main_train():
    """Canonical-training throughput: emulated model-days/min of training
    data consumed.  Headline = the device-resident window path (slab
    uploaded once, windows gathered on device by index); the async host
    pipeline is measured alongside with its input-wait share (it was 98.6%
    input-bound through the dev tunnel — the reason the resident path
    exists)."""
    from nasa_niswan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    _preflight()

    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import SequenceDataset
    from nasa_niswan_tpu.data.pipeline import async_batches
    from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.train.loop import (
        DeviceWindowSource,
        make_device_train_step,
        make_optimizer,
        make_train_step,
    )

    BS, T = 8, 48
    data = synthetic_e33oma_90d(T=720, seed=0, H=90, W=144)
    ds = SequenceDataset(data, period="train", sequence_length=T,
                         in_channels=8)
    bundle = build_model(
        "LSTM-bench", in_channels=8, hidden_channels=(64, 32, 16),
        kernel_sizes=(5, 3, 3), compute_dtype="bfloat16", remat=True,
        cell_impl="auto",  # resolves to the fused pallas2 + whole-scan
        # BPTT for training at B=8 — the production path; the build_model
        # default ("xla") silently benchmarked the slower cell for three
        # rounds (644 vs 553 ms/step)
    )
    params, state = bundle.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, (0.5, 0.999))
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(1)

    # --- device-resident path (the production default, train/loop.py)
    src = DeviceWindowSource(ds)
    step_d = make_device_train_step(
        bundle, ds.normalizer, opt, src, padded_shape=(100, 154),
        grid_shape=(90, 144), static=data["static"][:3],
    )

    def run_resident(epoch):
        nonlocal params, state, opt_state, rng
        order = np.arange(src.n)
        np.random.default_rng(epoch).shuffle(order)
        n_steps = 0
        tic = time.perf_counter()
        for s in range(0, src.n - src.n % BS, BS):
            starts = jnp.asarray(order[s : s + BS], jnp.int32)
            rng, srng = jax.random.split(rng)
            params, state, opt_state, metrics = step_d(
                params, state, opt_state, starts, srng
            )
            n_steps += 1
        np.asarray(metrics["loss"])  # drain the device queue (real sync)
        return n_steps, time.perf_counter() - tic

    run_resident(0)  # warmup/compile
    n_steps, elapsed = run_resident(1)
    value = (n_steps * BS * T / 48.0) / (elapsed / 60.0)

    # --- async host pipeline (for the input-wait diagnostic)
    step_h = make_train_step(
        bundle, ds.normalizer, opt, padded_shape=(100, 154),
        grid_shape=(90, 144), static=data["static"][:3], donate=False,
    )

    def run_host(epoch):
        nonlocal rng
        p, st, opt_s = params, state, opt_state
        n_steps, input_wait = 0, 0.0
        it = async_batches(ds, BS, shuffle=True, seed=0, epoch=epoch)
        tic = time.perf_counter()
        while True:
            t0 = time.perf_counter()
            batch = next(it, None)
            input_wait += time.perf_counter() - t0
            if batch is None:
                break
            rng, srng = jax.random.split(rng)
            p, st, opt_s, metrics = step_h(p, st, opt_s, *batch, srng)
            n_steps += 1
        np.asarray(metrics["loss"])
        return n_steps, time.perf_counter() - tic, input_wait

    run_host(0)
    h_steps, h_elapsed, h_wait = run_host(1)
    host_value = (h_steps * BS * T / 48.0) / (h_elapsed / 60.0)

    print(
        json.dumps(
            {
                "metric": "canonical training throughput (bs 8, T=48, "
                          "100x154, 8ch, bf16+remat, device-resident windows)",
                "value": round(value, 2),
                "unit": "model-days/min",
                "vs_baseline": round(value / 1000.0, 3),
                "host_pipeline_days_per_min": round(host_value, 2),
                "host_input_wait_frac": round(h_wait / h_elapsed, 4),
                "steps": n_steps,
            }
        )
    )


if __name__ == "__main__":
    import os
    import sys

    try:
        if "--train" in sys.argv[1:]:
            main_train()
        else:
            main()
    except BaseException:
        # print the diagnostic ourselves, then exit without teardown —
        # an exception propagating into interpreter shutdown intermittently
        # aborts ("FATAL: exception not rethrown") in the axon tunnel
        # client, converting a clean failure into rc=134 with no output
        import traceback

        traceback.print_exc()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(1)
    # the metric line is printed; skip interpreter teardown (same abort)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
