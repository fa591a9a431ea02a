"""Round-2 scientific demonstration runner (docs/RESULTS.md source).

Executes the full protocol on one TPU chip at canonical scale on a longer,
harder fixture than round 1 (1,440 steps = 30 model-days at 90x144 with 20
synthetic vertical levels):

  A. config #2: 20-level fusion windowed training (C = 62), bf16 + remat,
     hoisted input conv; eval windowed vs state-carrying rollout over the
     test tail; bf16-vs-f32 closed-loop drift at canonical scale.
  B. config #3: seq2seq scheduled-sampling training (6ch surface feedback
     model) — the inverse-sigmoid schedule anneals from ~teacher-forced to
     ~closed-loop inside one run; a teacher-only control isolates what
     scheduled sampling buys in closed-loop skill.

Usage: python scripts/run_results_r02.py [--epochs 12] [--out /tmp/r02]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Make the repo importable when run as `python scripts/run_results_r02.py`.
# Do NOT use PYTHONPATH for this: any PYTHONPATH entry (even an empty
# directory) breaks the axon TPU plugin's initialization — it leaks into a
# helper subprocess. sys.path edits stay in-process and are safe.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_a(data, out_dir: str, epochs: int):
    import jax

    from nasa_niswan_tpu.data.fusion import fuse_levels
    from nasa_niswan_tpu.data.dataset import SequenceDataset
    from nasa_niswan_tpu.evalx.evaluate import (
        evaluation_report,
        predict_test_rollout,
        predict_test_set,
    )
    from nasa_niswan_tpu.core.grid import GridSpec
    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.train.config import TrainConfig
    from nasa_niswan_tpu.train.loop import fit

    fused = fuse_levels(data, "bcb", levels=20)
    C = fused[0].shape[1]
    mk = lambda period: SequenceDataset(
        fused, period=period, sequence_length=48, species="bcb"
    )
    train_ds, val_ds, test_ds = mk("train"), mk("val"), mk("test")
    print(f"[A] fused C={C}, windows train/val/test = "
          f"{len(train_ds)}/{len(val_ds)}/{len(test_ds)}", flush=True)

    # bs 4: at the 20-level scale the remat scan carries (48 steps x 110 MB
    # at bs 8) plus the resident slabs exceed one chip's 16 GB; bs 4 fits
    cfg = TrainConfig(
        model="LSTM-FUSE20-r02", species="bcb", in_channels=C, levels=20,
        num_layers=3, hidden_channels=(64, 32, 16), kernel_size=(5, 3, 3),
        sequence_length=48, num_epochs=epochs, batch_size=4,
        input_size=(100, 154), compute_dtype="bfloat16",
        checkpoint_every=max(epochs // 3, 1),
        snapshot_dir=os.path.join(out_dir, "runA"),
    )
    # NOTE: no input-conv hoist for TRAINING — the hoisted
    # (B, T, H, W, 4*hidden0) buffer plus the remat backward plus the
    # device-resident slab exceeds comfortable HBM at bs 8; the hoist is a
    # serving-path (rollout) optimization.
    bundle = build_model(
        cfg.model, in_channels=C, hidden_channels=cfg.hidden_channels,
        kernel_sizes=cfg.kernel_size, compute_dtype="bfloat16", remat=True,
    )
    cfg.dump()
    t0 = time.time()
    out = fit(bundle, train_ds, val_ds, cfg)
    train_s = time.time() - t0

    padded = (100, 154)
    t0 = time.time()
    win = predict_test_set(
        bundle, out["params"], out["state"], test_ds, padded_shape=padded,
        batch_size=8,
    )
    windowed_s = time.time() - t0
    t0 = time.time()
    rol = predict_test_rollout(
        bundle.config, out["params"], test_ds, padded_shape=padded
    )
    rollout_s = time.time() - t0

    grid = GridSpec(nlat=90, nlon=144)
    rep_w = evaluation_report(win["GTs"], win["PDs"], grid.lat, grid.lon)
    rep_r = evaluation_report(rol["GTs"], rol["PDs"], grid.lat, grid.lon)

    # canonical-scale bf16 vs f32 closed-loop drift over the whole test tail
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig
    from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn

    frames, _ = test_ds.forcing_stream()
    drift = {}
    trajs = {}
    for dt in ("bfloat16", "float32"):
        rcfg = ConvLSTMConfig(
            in_channels=C, hidden_channels=(64, 32, 16),
            kernel_sizes=(5, 3, 3), compute_dtype=dt,
        )
        r = make_rollout_fn(
            rcfg, test_ds.normalizer, padded_shape=padded, grid_shape=(90, 144)
        )
        preds, state = [], None
        for s in range(0, frames.shape[0], 192):
            p, state = r(out["params"], frames[None, s : s + 192], state)
            preds.append(np.asarray(p[0]))
        trajs[dt] = np.concatenate(preds)
    diff = trajs["bfloat16"] - trajs["float32"]
    scale = float(np.std(trajs["float32"])) + 1e-12
    nrmse_t = np.sqrt((diff**2).mean(axis=(1, 2))) / scale
    drift = {
        "nrmse_first100_mean": float(nrmse_t[:100].mean()),
        "nrmse_last100_mean": float(nrmse_t[-100:].mean()),
        "nrmse_max": float(nrmse_t.max()),
    }

    result = {
        "config": "A: 20-level fusion (C=62), windowed train, canonical grid",
        "epochs": epochs,
        "train_wall_s": round(train_s, 1),
        "final_train_r2": out["logger"]["r2_score"][-1],
        "final_val_r2": out["logger"]["r2_score_val"][-1],
        "windowed": {
            "temporal_r2": rep_w["temporal_r2_summary"],
            "global_r2": rep_w["global_r2"],
            "pearson_r": rep_w["pearson_r"],
            "wall_s": round(windowed_s, 1),
        },
        "rollout": {
            "temporal_r2": rep_r["temporal_r2_summary"],
            "global_r2": rep_r["global_r2"],
            "pearson_r": rep_r["pearson_r"],
            "wall_s": round(rollout_s, 1),
        },
        "bf16_drift_vs_f32": drift,
    }
    print("[A]", json.dumps(result, indent=2), flush=True)
    return result


def run_b(data, out_dir: str, epochs: int):
    import jax

    from nasa_niswan_tpu.data.dataset import Seq2SeqDataset
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
    from nasa_niswan_tpu.rollout.seq2seq import fit_seq2seq

    mk = lambda period: Seq2SeqDataset(
        data, period=period, species="bcb", sequence_length=48
    )
    train_ds, val_ds = mk("train"), mk("val")
    print(f"[B] seq2seq chunks train/val = {len(train_ds)}/{len(val_ds)}",
          flush=True)
    cfg = ConvLSTMConfig(
        in_channels=6, hidden_channels=(64, 32, 16), kernel_sizes=(5, 3, 3),
        compute_dtype="bfloat16", remat=True,
    )

    results = {}
    for label, k in (("scheduled", 10.0), ("teacher_only", 1e6)):
        params = convlstm_init(jax.random.PRNGKey(0), cfg)
        t0 = time.time()
        _, _, history = fit_seq2seq(
            cfg, params, train_ds, val_dataset=val_ds,
            padded_shape=(100, 154), grid_shape=(90, 144),
            num_epochs=epochs, batch_size=4, schedule_k=k,
            snapshot_dir=os.path.join(out_dir, f"runB_{label}"),
            checkpoint_every=epochs,
        )
        results[label] = {
            "wall_s": round(time.time() - t0, 1),
            "teacher_prob_final": history[-1]["teacher_prob"],
            "closed_loop_val_r2": [round(h["r2_val"], 4) for h in history],
        }
        print(f"[B:{label}]", json.dumps(results[label]), flush=True)
    return {"config": "B: seq2seq 6ch scheduled sampling vs teacher-only",
            "epochs": epochs, **results}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--epochs-b", type=int, default=12)
    ap.add_argument("--steps", type=int, default=1440)
    ap.add_argument("--out", default="/tmp/results_r02")
    ap.add_argument("--skip-a", action="store_true")
    ap.add_argument("--skip-b", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # Touch the device FIRST: the axon tunnel backend fails to initialize
    # when its first use comes minutes into the process (observed twice:
    # "Backend 'axon' is not in the list of known backends" after the
    # ~4-minute fixture generation), but initializes fine at process start.
    import jax

    print("devices:", jax.devices(), flush=True)

    from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d

    t0 = time.time()
    data = synthetic_e33oma_90d(T=args.steps, seed=7, H=90, W=144, nlev=20)
    print(f"fixture T={args.steps} 90x144x20: {time.time()-t0:.0f}s", flush=True)

    report = {}
    if not args.skip_a:
        report["A"] = run_a(data, args.out, args.epochs)
    if not args.skip_b:
        # seq2seq runs at the surface (level-0) slice of the same fixture
        surf = {
            k: (v[:, 0] if v.ndim == 4 and k != "static" else v)
            for k, v in data.items()
        }
        report["B"] = run_b(surf, args.out, args.epochs_b)
    with open(os.path.join(args.out, "results_r02.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("WROTE", os.path.join(args.out, "results_r02.json"), flush=True)


if __name__ == "__main__":
    main()
