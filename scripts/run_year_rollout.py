"""Year-horizon closed-loop demonstration (config #5 serving story).

Trains the canonical surface emulator (8ch: 5 forcings + 3 static attrs,
ConvLSTM 64/32/16) on the FIRST 30 days of a year-long synthetic
realization, then runs the compiled state-carrying rollout over the
remaining ~335 days (16,080 half-hour steps) in chunks, measuring closed-
loop skill as a function of horizon — does R² decay over a year?

    python scripts/run_year_rollout.py [--train-days 30] [--epochs 12]

Writes results_year.json: per-30-day-block temporal R², overall R²,
sustained rollout throughput (model-days/min, real serving shapes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=17520)  # one model year
    ap.add_argument("--train-days", type=int, default=30)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=1752)
    ap.add_argument("--out", default="/tmp/results_year")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    print("devices:", jax.devices(), flush=True)

    from nasa_niswan_tpu.data.dataset import SequenceDataset
    from nasa_niswan_tpu.data.pipeline import ChunkDrain
    from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
    from nasa_niswan_tpu.evalx.metrics import r2_temporal
    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.rollout.autoregressive import (
        make_rollout_fn,
        model_days_per_min,
    )
    from nasa_niswan_tpu.train.config import TrainConfig
    from nasa_niswan_tpu.train.loop import fit

    t0 = time.time()
    data = synthetic_e33oma_90d(T=args.steps, seed=7, H=90, W=144)
    print(f"year fixture T={args.steps}: {time.time()-t0:.0f}s", flush=True)

    n_train = args.train_days * 48
    head = {k: (v if k == "static" else v[:n_train]) for k, v in data.items()}

    cfg = TrainConfig(
        model="LSTM-YEAR", species="bcb", in_channels=8,
        num_layers=3, hidden_channels=(64, 32, 16), kernel_size=(5, 3, 3),
        sequence_length=48, num_epochs=args.epochs, batch_size=8,
        input_size=(100, 154), compute_dtype="bfloat16",
        checkpoint_every=args.epochs,
        snapshot_dir=os.path.join(args.out, "run"),
    )
    mk = lambda period: SequenceDataset(
        head, period=period, sequence_length=48, species="bcb", in_channels=8
    )
    train_ds, val_ds = mk("train"), mk("val")
    bundle = build_model(
        cfg.model, in_channels=8, hidden_channels=cfg.hidden_channels,
        kernel_sizes=cfg.kernel_size, compute_dtype="bfloat16", remat=True,
    )
    cfg.dump()
    t0 = time.time()
    out = fit(bundle, train_ds, val_ds, cfg, static=data["static"][:3])
    train_s = time.time() - t0
    print(f"train {train_s:.0f}s", flush=True)

    rollout = make_rollout_fn(
        bundle.config, train_ds.normalizer, padded_shape=(100, 154),
        grid_shape=(90, 144), static=data["static"][:3],
    )
    # stream the remaining ~335 days through the carried-state rollout
    forcings = np.stack(
        [data["u"], data["v"], data["omega"], data["prec"], data["bcb_src"]],
        axis=1,
    ).astype(np.float32)  # (T, 5, H, W)
    gts = data["bcb_conc"]
    state = None
    n_steps = 0
    t0 = time.time()
    drain = ChunkDrain()  # one-chunk pipeline: dispatch k+1 before fetching k
    for s in range(n_train, args.steps, args.chunk):
        chunk = forcings[None, s : s + args.chunk]
        p, state = rollout(out["params"], chunk, state)
        drain.push(p[0])
        n_steps += chunk.shape[1]
    preds = drain.finish()
    elapsed = time.time() - t0
    preds = np.concatenate(preds)
    days_min = model_days_per_min(n_steps, elapsed)
    print(f"rollout {n_steps} steps in {elapsed:.1f}s = "
          f"{days_min:.0f} model-days/min", flush=True)

    gt_tail = gts[n_train : n_train + preds.shape[0]]
    r2_t = np.asarray(r2_temporal(gt_tail, preds))
    block = 30 * 48
    blocks = [
        {
            "days": f"{(i*block)//48}-{((i+1)*block)//48}",
            "r2_mean": float(np.nanmean(r2_t[i * block : (i + 1) * block])),
        }
        for i in range((len(r2_t) + block - 1) // block)
    ]
    result = {
        "config": "year-horizon closed-loop rollout, canonical 8ch surface",
        "train_days": args.train_days,
        "epochs": args.epochs,
        "train_wall_s": round(train_s, 1),
        "final_val_r2": out["logger"]["r2_score_val"][-1],
        "rollout_steps": int(n_steps),
        "rollout_wall_s": round(elapsed, 1),
        "rollout_days_per_min": round(days_min, 1),
        "temporal_r2_overall_mean": float(np.nanmean(r2_t)),
        "temporal_r2_last30d_mean": float(np.nanmean(r2_t[-block:])),
        "temporal_r2_by_30d_block": blocks,
    }
    print(json.dumps(result, indent=2), flush=True)
    with open(os.path.join(args.out, "results_year.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
