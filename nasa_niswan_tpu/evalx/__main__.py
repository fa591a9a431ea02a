"""Evaluation entry point: ``python -m nasa_niswan_tpu.evalx --run-dir <snapshot>``.

The CLI form of the reference's test.ipynb: reload configurations.json (the
train<->eval contract, cell 3), restore the checkpoint (cell 6), stream the
test split (cells 7-8), compute the metric battery (cells 12-44), and write
``test-results.npy`` + ``evaluation.json`` into the run directory.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    from nasa_niswan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Evaluate a trained emulator.")
    p.add_argument("--run-dir", required=True,
                   help="snapshot dir holding configurations.json + epoch-NNN/")
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch checkpoint to load (default: latest)")
    p.add_argument("--mode", choices=("windowed", "rollout"), default="windowed")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--export-hidden", action="store_true",
                   help="also save per-window per-step head taps to HSs.npy "
                        "(test.ipynb cell 8's HSs buffer; LSTM family only)")
    p.add_argument("--oat", action="store_true",
                   help="run the OAT sensitivity sweep (cells 56-57) and "
                        "save oat_sensitivity.npz + boxplot")
    p.add_argument("--export-artifact", metavar="PATH", default=None,
                   help="also serialize the compiled rollout (params + "
                        "normalizer baked in) as a frozen serving artifact "
                        "(rollout/export.py; LSTM family only)")
    p.add_argument("--artifact-chunk", type=int, default=48,
                   help="chunk_steps the exported artifact accepts")
    args = p.parse_args(argv)

    from nasa_niswan_tpu.core.grid import GridSpec
    from nasa_niswan_tpu.evalx.evaluate import (
        evaluation_report,
        predict_test_rollout,
        predict_test_set,
        save_test_results,
    )
    from nasa_niswan_tpu.evalx.snapshot import load_snapshot

    # load_snapshot mirrors train/__main__.build_datasets exactly — the eval
    # CLI must round-trip every configurations.json the trainer writes
    # (test.ipynb cell 3's contract), including config #2 (--levels 20
    # fusion) and config #3 (--mode seq2seq feedback snapshots).
    snap = load_snapshot(args.run_dir, epoch=args.epoch)
    cfg, bundle, test_ds = snap.cfg, snap.bundle, snap.dataset
    params, eval_state = snap.params, snap.eval_state
    closed_loop, feedback_single = snap.closed_loop, snap.feedback_single
    static, padded = snap.static, snap.padded_shape
    print("Number of Epochs:", snap.meta.get("epoch"))
    if (closed_loop or feedback_single) and (
        args.export_hidden or args.oat or args.export_artifact
    ):
        # refuse BEFORE the (expensive) closed-loop rollout, not after
        raise SystemExit(
            "--export-hidden/--oat/--export-artifact drive the LSTM "
            "open-loop windowed/rollout paths; not available for "
            "closed-loop (seq2seq / UNet-6ch feedback) snapshots"
        )
    if closed_loop:
        # a seq2seq snapshot's feedback channel must carry the model's own
        # prediction — windowed/rollout modes would silently feed zeros or
        # treat it as a static channel (the round-2 mis-evaluation)
        from nasa_niswan_tpu.evalx.evaluate import predict_test_closed_loop

        print("seq2seq snapshot: running closed-loop feedback evaluation")
        out = predict_test_closed_loop(
            bundle.config, params, test_ds, padded_shape=padded
        )
    elif feedback_single:
        from nasa_niswan_tpu.evalx.evaluate import predict_test_feedback

        print("6-channel feedback snapshot: running closed-loop evaluation")
        out = predict_test_feedback(
            bundle, params, eval_state, test_ds, padded_shape=padded
        )
    elif args.mode == "rollout" and bundle.is_sequence:
        out = predict_test_rollout(
            bundle.config, params, test_ds, padded_shape=padded, static=static
        )
    else:
        out = predict_test_set(
            bundle, params, eval_state, test_ds, padded_shape=padded,
            batch_size=args.batch_size, static=static,
        )

    if args.export_hidden:
        if not bundle.is_sequence:
            raise SystemExit("--export-hidden needs the LSTM family")
        from nasa_niswan_tpu.evalx.evaluate import predict_test_hidden

        hss = predict_test_hidden(
            bundle.config, params, test_ds, padded_shape=padded,
            batch_size=args.batch_size, static=static,
        )
        np.save(os.path.join(args.run_dir, "HSs.npy"), hss)
        print(f"HSs.npy saved: {hss.shape}")

    if args.oat:
        if not bundle.is_sequence:
            raise SystemExit("--oat drives the compiled rollout (LSTM family)")
        from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn
        from nasa_niswan_tpu.rollout.sensitivity import oat_sensitivity

        rollout = make_rollout_fn(
            bundle.config, test_ds.normalizer, padded_shape=padded,
            grid_shape=tuple(out["GTs"].shape[-2:]), static=static,
        )
        frames, _ = test_ds.forcing_stream()
        deltas = oat_sensitivity(rollout, params, frames[None])
        np.savez_compressed(
            os.path.join(args.run_dir, "oat_sensitivity.npz"),
            **{k: v.astype(np.float32) for k, v in deltas.items()},
        )
        try:
            from nasa_niswan_tpu.evalx.plots import plot_oat_boxplot

            plot_oat_boxplot(
                deltas,
                save_path=os.path.join(args.run_dir, "oat_boxplot.png"),
            )
            print("oat_boxplot.png saved")
        except ImportError:
            print("matplotlib unavailable; oat_sensitivity.npz saved only")

    if args.export_artifact:
        if not bundle.is_sequence:
            raise SystemExit("--export-artifact needs the LSTM family")
        from nasa_niswan_tpu.rollout.export import export_rollout

        blob = export_rollout(
            bundle.config, test_ds.normalizer, params,
            batch=1, chunk_steps=args.artifact_chunk,
            n_channels=5 if static is not None else cfg.in_channels,
            grid_shape=tuple(out["GTs"].shape[-2:]), padded_shape=padded,
            static=static, path=args.export_artifact,
        )
        print(f"serving artifact: {args.export_artifact} ({len(blob)} bytes)")

    grid = GridSpec(nlat=out["GTs"].shape[-2], nlon=out["GTs"].shape[-1])
    report = evaluation_report(out["GTs"], out["PDs"], grid.lat, grid.lon)
    save_test_results(args.run_dir, out["GTs"], out["PDs"])
    serializable = {
        k: v for k, v in report.items() if not isinstance(v, np.ndarray)
    }
    with open(os.path.join(args.run_dir, "evaluation.json"), "w") as f:
        json.dump(serializable, f, indent=2)
    s = report["temporal_r2_summary"]
    print(
        f"temporal R2 mean/median/max: {s['mean']:.4f} / {s['median']:.4f} / "
        f"{s['max']:.4f}"
    )
    print("global R2:", f"{report['global_r2']:.4f}",
          " pearson r:", f"{report['pearson_r']:.4f}")
    return report


if __name__ == "__main__":
    main()
