"""Cell-kernel shootout at the north-star rollout shapes (one real chip).

Compares sustained rollout step time across cell implementations and the
input-conv hoist, at the BASELINE config #2 shapes (90x144x20 fusion,
C = 62, ConvLSTM 64/32/16 k=5/3/3, bf16, batch 1):

    python scripts/bench_cell.py [--steps 384] [--reps 3] [--impls ...]

Prints one JSON line per variant with ms/step and model-days/min.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo import bootstrap — PYTHONPATH must stay unset (it breaks the axon
# TPU plugin; see run_results_r02.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=384)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument(
        "--impls",
        nargs="*",
        default=["xla:hoist", "xla:scan", "pallas2:scan", "pallas2:hoist",
                 "pallas:scan"],
        help="impl:mode pairs; mode hoist = precompute_input_conv",
    )
    ap.add_argument(
        "--train", action="store_true",
        help="benchmark the TRAINING step (value_and_grad + adam update) "
             "instead of the serving rollout, at the canonical config-#1 "
             "shapes (T=48, 5ch, 90x144->100x154, bf16) for each "
             "--train-batches batch size; compares the pallas2 whole-scan "
             "BPTT (ops/convlstm_bptt.py) against XLA autodiff+remat",
    )
    ap.add_argument("--train-batches", nargs="*", type=int, default=[4, 8])
    ap.add_argument("--train-steps", type=int, default=6)
    ap.add_argument(
        "--parity", action="store_true",
        help="before timing, assert the COMPILED pallas2 path matches the "
             "XLA cell on this backend at bf16 tolerance (the guard behind "
             "cell_impl='auto' swapping kernels in serving)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
    from nasa_niswan_tpu.rollout.autoregressive import (
        make_rollout_fn,
        model_days_per_min,
    )

    if args.train:
        _bench_train(args)
        return

    C = 3 * 20 + 2
    PADDED, GRID = (100, 154), (90, 144)
    norm = Normalizer(
        x_mean=np.zeros(C, np.float32), x_std=np.ones(C, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    rng = np.random.default_rng(0)
    forcings = jnp.asarray(
        rng.standard_normal((args.batch, args.steps, C, *GRID)).astype(
            np.float32
        )
    )

    if args.parity:
        # Compiled-path parity: the interpreter-mode tests validate the
        # kernel's math at f32; this asserts the REAL compiled TPU kernel
        # against the XLA cell at bf16 tolerance on short rollouts, so the
        # serving auto-swap (rollout/autoregressive.resolve_cell_impl) is
        # guarded on actual hardware.
        T_par = min(48, args.steps)
        outs = {}
        for impl in ("xla", "pallas2"):
            cfg = ConvLSTMConfig(
                in_channels=C, hidden_channels=(64, 32, 16),
                kernel_sizes=(5, 3, 3), compute_dtype="bfloat16",
                cell_impl=impl,
            )
            params = convlstm_init(jax.random.PRNGKey(0), cfg)
            rollout = make_rollout_fn(
                cfg, norm, padded_shape=PADDED, grid_shape=GRID,
                precompute_input_conv=False, cell_impl=None,
            )
            preds, state = rollout(params, forcings[:, :T_par])
            outs[impl] = (np.asarray(preds), np.asarray(state[0][0]))
        scale = max(np.abs(outs["xla"][0]).max(), 1e-6)
        for impl in ("pallas2",):
            d_pred = np.abs(outs["xla"][0] - outs[impl][0])
            d_h = np.abs(outs["xla"][1] - outs[impl][1])
            rel = d_pred.max() / scale
            print(json.dumps({
                "parity": f"{impl}-vs-xla compiled bf16",
                "steps": T_par,
                "max_abs_pred": float(d_pred.max()),
                "max_rel_pred": float(rel),
                "max_abs_h": float(d_h.max()),
            }), flush=True)
            # bf16 has ~3 decimal digits; 48 recurrent steps compound ~2%
            assert rel < 0.05, f"compiled {impl} diverges from XLA: rel={rel}"

    base_params = None
    for spec in args.impls:
        impl, mode = spec.split(":")
        cfg = ConvLSTMConfig(
            in_channels=C, hidden_channels=(64, 32, 16),
            kernel_sizes=(5, 3, 3), compute_dtype="bfloat16",
            cell_impl=impl,
        )
        if base_params is None:
            base_params = convlstm_init(jax.random.PRNGKey(0), cfg)
        rollout = make_rollout_fn(
            cfg, norm, padded_shape=PADDED, grid_shape=GRID,
            precompute_input_conv=(mode == "hoist"), cell_impl=None,
        )
        try:
            preds, _ = rollout(base_params, forcings)
            ref_last = np.asarray(preds[0, -1])
            tic = time.perf_counter()
            for _ in range(args.reps):
                preds, _ = rollout(base_params, forcings)
                np.asarray(preds[0, -1])
            elapsed = (time.perf_counter() - tic) / args.reps
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"impl": spec, "error": repr(e)[:300]}))
            continue
        ms_step = elapsed / args.steps * 1e3
        days = model_days_per_min(args.steps, elapsed, batch=args.batch)
        print(
            json.dumps(
                {
                    "impl": spec,
                    "ms_per_step": round(ms_step, 4),
                    "days_per_min": round(days, 1),
                    "last_map_mean": float(ref_last.mean()),
                }
            ),
            flush=True,
        )


def _bench_train(args):
    """Training-step rows: per batch size, full jitted train step
    (preprocess + value_and_grad + adam) for xla vs pallas2.  The pallas2
    path runs the whole-scan BPTT; per-step host sync (float(loss)) is
    required because block_until_ready is asynchronous through the axon
    tunnel."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.train.loop import make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32), x_std=np.ones(5, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    variants = (
        ("xla", dict(cell_impl="xla")),
        ("pallas2", dict(cell_impl="pallas2")),  # fused Pallas backward
        ("pallas2_xlabwd", dict(cell_impl="pallas2", bptt_bwd="xla")),
    )
    for B in args.train_batches:
        row = {"train_batch": B}
        for impl, kw in variants:
            bundle = build_model(
                "LSTM", in_channels=5, compute_dtype="bfloat16",
                remat=True, **kw,
            )
            params, state = bundle.init(jax.random.PRNGKey(0))
            opt = make_optimizer(1e-3, (0.9, 0.999))
            opt_state = opt.init(params)
            step = make_train_step(
                bundle, norm, opt, padded_shape=(100, 154),
                grid_shape=(90, 144),
            )
            x = jnp.asarray(
                rng.standard_normal((B, 48, 5, 90, 144)), jnp.float32
            )
            y = jnp.asarray(rng.standard_normal((B, 90, 144)), jnp.float32)
            key = jax.random.PRNGKey(1)
            try:
                params, state, opt_state, m = step(
                    params, state, opt_state, x, y, key
                )
                float(m["loss"])
                ts = []
                for _ in range(args.train_steps):
                    t0 = _time.perf_counter()
                    params, state, opt_state, m = step(
                        params, state, opt_state, x, y, key
                    )
                    row[f"loss_{impl}"] = round(float(m["loss"]), 6)
                    ts.append((_time.perf_counter() - t0) * 1e3)
                row[f"ms_{impl}"] = round(min(ts), 1)
            except Exception as e:  # noqa: BLE001 — report and continue
                row[f"error_{impl}"] = repr(e)[:200]
        if "ms_xla" in row and "ms_pallas2" in row:
            row["speedup_pallas2"] = round(row["ms_xla"] / row["ms_pallas2"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
