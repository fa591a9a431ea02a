"""Config #3 protocol: does scheduled sampling buy closed-loop test skill?

Trains the 6ch feedback emulator two ways at equal budget — inverse-sigmoid
scheduled sampling annealed DEEP (teacher prob -> ~0.05) vs teacher-forced
only — and evaluates both fully closed-loop on the held-out TEST period
(feedback from own predictions, the deployment condition).

    python scripts/run_seq2seq_protocol.py [--epochs 25] [--steps 1440]

Writes results_seq2seq.json with per-epoch closed-loop val curves and the
final test-period closed-loop R² for both variants.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def closed_loop_test_r2(cfg, params, norm, test_ds, batch_size, eval_step):
    import jax.numpy as jnp

    n = len(test_ds)
    r2s = []
    for s in range(0, n, batch_size):
        idx = list(range(s, min(s + batch_size, n)))
        items = [test_ds[i] for i in idx]
        n_real = len(items)
        if n_real < batch_size:  # pad to keep shapes static
            items = items + [items[-1]] * (batch_size - n_real)
        xs, p0s, ys = zip(*items)
        _, r2v = eval_step(params, np.stack(xs), np.stack(p0s), np.stack(ys))
        # every test window is evaluated (no remainder dropping); weight the
        # batch-level score by real samples (duplicates still enter the
        # final batch's own R2 — a small, conservative bias)
        r2s.extend([float(r2v)] * n_real)
    return float(np.mean(r2s))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1440)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--schedule-k", type=float, default=5.0)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="/tmp/seq2seq_protocol")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    print("devices:", jax.devices(), flush=True)

    from nasa_niswan_tpu.data.dataset import Seq2SeqDataset
    from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
    from nasa_niswan_tpu.rollout.seq2seq import (
        fit_seq2seq,
        inverse_sigmoid_schedule,
        make_seq2seq_eval_step,
    )

    t0 = time.time()
    data = synthetic_e33oma_90d(T=args.steps, seed=7)
    print(f"fixture: {time.time()-t0:.0f}s", flush=True)
    mk = lambda period: Seq2SeqDataset(
        data, period=period, species="bcb", sequence_length=48
    )
    train_ds, val_ds, test_ds = mk("train"), mk("val"), mk("test")
    print(
        f"chunks train/val/test = {len(train_ds)}/{len(val_ds)}/{len(test_ds)}",
        flush=True,
    )
    cfg = ConvLSTMConfig(
        in_channels=6, hidden_channels=(64, 32, 16), kernel_sizes=(5, 3, 3),
        compute_dtype="bfloat16", remat=True,
    )
    eval_step = make_seq2seq_eval_step(
        cfg, train_ds.normalizer, padded_shape=(100, 154), grid_shape=(90, 144)
    )

    report = {
        "config": "seq2seq protocol: deep-annealed scheduled sampling vs "
                  "teacher-only, closed-loop test eval",
        "epochs": args.epochs,
        "final_teacher_prob_scheduled": inverse_sigmoid_schedule(
            args.epochs, args.schedule_k
        ),
    }
    for label, k in (("scheduled", args.schedule_k), ("teacher_only", 1e6)):
        params = convlstm_init(jax.random.PRNGKey(0), cfg)
        t0 = time.time()
        params, _, history = fit_seq2seq(
            cfg, params, train_ds, val_dataset=val_ds,
            normalizer=train_ds.normalizer,
            padded_shape=(100, 154), grid_shape=(90, 144),
            num_epochs=args.epochs, batch_size=args.batch, schedule_k=k,
            snapshot_dir=os.path.join(args.out, label),
            checkpoint_every=args.epochs,
        )
        test_r2 = closed_loop_test_r2(
            cfg, params, train_ds.normalizer, test_ds, args.batch, eval_step
        )
        report[label] = {
            "wall_s": round(time.time() - t0, 1),
            "val_r2_curve": [round(h["r2_val"], 4) for h in history],
            "test_closed_loop_r2": round(test_r2, 4),
        }
        print(f"[{label}] test closed-loop R2 = {test_r2:.4f}", flush=True)

    print(json.dumps(report, indent=2), flush=True)
    with open(os.path.join(args.out, "results_seq2seq.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
