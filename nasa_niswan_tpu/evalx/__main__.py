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

import jax
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
    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.train.checkpoint import latest_epoch_dir, load_checkpoint
    from nasa_niswan_tpu.train.config import TrainConfig
    from nasa_niswan_tpu.train.__main__ import load_data

    cfg = TrainConfig.load(os.path.join(args.run_dir, "configurations.json"))
    cfg.snapshot_dir = args.run_dir
    bundle = build_model(
        cfg.model, in_channels=cfg.in_channels,
        hidden_channels=cfg.hidden_channels, kernel_sizes=cfg.kernel_size,
        compute_dtype=cfg.compute_dtype, cell_impl=cfg.cell_impl,
        unet_features=cfg.unet_features,
        pix2pix_features=cfg.pix2pix_features,
    )
    data = load_data(cfg)
    # Mirror train/__main__.build_datasets exactly — the eval CLI must
    # round-trip every configurations.json the trainer writes (test.ipynb
    # cell 3's contract), including config #2 (--levels 20 fusion) and
    # config #3 (--mode seq2seq feedback snapshots).
    n_forcing = 5
    if cfg.levels > 1:
        from nasa_niswan_tpu.data.fusion import fuse_levels, fusion_channel_count

        data = fuse_levels(data, cfg.species, levels=cfg.levels)
        n_forcing = fusion_channel_count(cfg.levels)
    closed_loop = cfg.mode == "seq2seq" and bundle.is_sequence
    if closed_loop:
        from nasa_niswan_tpu.data.dataset import Seq2SeqDataset

        test_ds = Seq2SeqDataset(
            data, period="test", species=cfg.species,
            sequence_length=cfg.sequence_length,
        )
    elif bundle.is_sequence:
        from nasa_niswan_tpu.data.dataset import SequenceDataset

        kw = {} if cfg.levels > 1 else {"in_channels": cfg.in_channels}
        test_ds = SequenceDataset(
            data, period="test", species=cfg.species,
            sequence_length=cfg.sequence_length, **kw,
        )
    else:
        from nasa_niswan_tpu.data.dataset import SingleStepDataset

        test_ds = SingleStepDataset(
            data, period="test", species=cfg.species,
            in_channels=cfg.in_channels, transform=cfg.transform,
        )

    ckpt_dir = (
        os.path.join(args.run_dir, f"epoch-{args.epoch:03d}")
        if args.epoch is not None
        else latest_epoch_dir(args.run_dir)
    )
    if ckpt_dir is None:
        raise SystemExit(f"no epoch-NNN checkpoint under {args.run_dir}")
    tmpl_params, tmpl_state = bundle.init(jax.random.PRNGKey(cfg.seed))
    # model_state carries the UNet's BN running stats (torch state_dict
    # semantics, utils.py:23-32); older checkpoints fall back to the
    # template
    params, _, eval_state, meta = load_checkpoint(
        ckpt_dir, tmpl_params, state_template=tmpl_state
    )
    print("Number of Epochs:", meta.get("epoch"))

    # Static-attribute channels ride above the forcing stack (and the
    # feedback channel in seq2seq mode, train/config.py:71-72).  A
    # 6-channel single-step snapshot (UNet-6ch) has a FEEDBACK channel,
    # not a static one — and gets the closed-loop loop of test.ipynb
    # cell 8 ("if UNet-6ch and counter != 1: X[:, -1] = pred").
    feedback_single = bundle.family == "UNet" and cfg.in_channels == 6
    n_static = cfg.in_channels - n_forcing - (
        1 if (closed_loop or feedback_single) else 0
    )
    static = (
        data["static"][:n_static]
        if n_static > 0 and isinstance(data, dict) and "static" in data
        else None
    )
    padded = tuple(cfg.input_size)
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
