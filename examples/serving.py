"""Deployment-side serving walkthrough: train -> export one frozen
artifact -> serve chunks with a carried state (no model code needed at
load time beyond this framework's export loader).

Run (CPU example sizes; raise on TPU):
    python examples/serving.py --outdir /tmp/niswan-serving
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="/tmp/niswan-serving")
    p.add_argument("--grid", nargs=2, type=int, default=(24, 36))
    p.add_argument("--steps", type=int, default=160)
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    H, W = args.grid
    padded = (H + 8, W + 8)

    import jax

    from nasa_niswan_tpu.data.dataset import SequenceDataset
    from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.rollout.export import (
        export_rollout,
        initial_rollout_state,
        load_rollout,
    )
    from nasa_niswan_tpu.train.config import TrainConfig
    from nasa_niswan_tpu.train.loop import fit

    # 1. train (tiny, fixture-backed)
    data = synthetic_e33oma_90d(T=args.steps, H=H, W=W, seed=0)
    mk = lambda period: SequenceDataset(
        data, period=period, sequence_length=6, species="bcb"
    )
    train_ds, val_ds, test_ds = mk("train"), mk("val"), mk("test")
    cfg = TrainConfig(
        model="LSTM-serve-demo", species="bcb", in_channels=5, num_layers=2,
        hidden_channels=(8, 8), kernel_size=(5, 3), sequence_length=6,
        num_epochs=args.epochs, batch_size=4, input_size=padded,
        snapshot_dir=os.path.join(args.outdir, "run"),
        checkpoint_every=args.epochs,
    )
    bundle = build_model(
        cfg.model, in_channels=5, hidden_channels=cfg.hidden_channels,
        kernel_sizes=cfg.kernel_size,
    )
    cfg.dump()
    out = fit(bundle, train_ds, val_ds, cfg)

    # 2. freeze: params + normalization + compiled rollout in one file
    artifact = os.path.join(args.outdir, "emulator.bin")
    chunk = 8
    export_rollout(
        bundle.config, train_ds.normalizer, out["params"],
        batch=1, chunk_steps=chunk, n_channels=5,
        grid_shape=(H, W), padded_shape=padded, path=artifact,
    )
    print("artifact:", artifact, os.path.getsize(artifact), "bytes")

    # 3. serve: load WITHOUT the training code path; stream chunks,
    # carry the state — the in-line ModelE-surrogate loop
    serve = load_rollout(artifact)
    frames, targets = test_ds.forcing_stream()
    state = initial_rollout_state(bundle.config, 1, padded)
    preds = []
    usable = frames.shape[0] - frames.shape[0] % chunk
    for s in range(0, usable, chunk):
        p_chunk, state = serve(frames[None, s : s + chunk], state)
        preds.append(np.asarray(p_chunk[0]))
    preds = np.concatenate(preds)
    print(f"served {preds.shape[0]} steps; pred field mean "
          f"{preds.mean():.4f} (physical units)")


if __name__ == "__main__":
    main()
