"""Serving entry point: ``python -m nasa_niswan_tpu.rollout --run-dir <snapshot>``.

The production mode the reference only sketches in a notebook: stream
forcing frames through the compiled state-carrying rollout in fixed-size
chunks (ONE continuous episode, no state resets) and write physical-unit
predictions to netCDF — the in-line ModelE-surrogate pattern
(reference README.md:12,29: interactive NINT replacement).  The carry can
be persisted (``--state-out``) and resumed (``--state-in``) so emulation
continues bit-exactly across invocations, matching how a host model stops
and restarts between jobs.

Routes every snapshot kind the trainer writes (test.ipynb cell 3's
configurations.json contract, via evalx.snapshot.load_snapshot):

  * LSTM open-loop (configs #1/#2, optional static channels): the compiled
    autoregressive rollout (rollout/autoregressive.make_rollout_fn).
  * LSTM seq2seq (config #3): closed-loop — the feedback channel carries
    the model's own previous prediction (test.ipynb cell 8 semantics).
  * UNet-6ch feedback and plain single-step families: served through their
    evaluation forward paths (no recurrent carry to persist).

``--artifact`` serves a frozen ``jax.export`` blob (rollout/export.py)
instead of live-jitting — the deployment contract where the serving
process needs no checkpoint, just the artifact and the forcing stream.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _positive(name: str, v: int) -> int:
    if v <= 0:
        raise SystemExit(f"{name} must be positive, got {v}")
    return v


def _slice_stream(frames: np.ndarray, skip: int, steps: int | None):
    if skip >= frames.shape[0]:
        raise SystemExit(
            f"--skip {skip} >= available stream length {frames.shape[0]}"
        )
    out = frames[skip:]
    if steps is not None:
        if steps > out.shape[0]:
            raise SystemExit(
                f"--steps {steps} > available stream length {out.shape[0]} "
                f"after --skip {skip}"
            )
        out = out[:steps]
    return out


def _device_resident(frames, limit_gb: float, mesh=None):
    """Upload the sliced forcing stream to the device ONCE when it fits;
    per-chunk slices then move no host data.  Measured at config-#3
    canonical shapes: per-chunk host uploads wall ~6 ms/step through a dev
    link while the compute is 0.5 — the decadal runner's block-resident
    pattern, applied to the CLI (docs/PERFORMANCE.md closed-loop row).

    With a serving ``mesh`` (--sharded) the slab is spread over the
    (lat, lon) mesh axes instead of concentrated on device 0 — the raw
    (T, C, h, w) grid shards over its trailing spatial dims, so each chip
    holds ~1/n of the stream and the in-jit reshard rides ICI.

    Falls back to host streaming (the pre-resident behavior) if the device
    allocator refuses the slab — params/activations may leave less free HBM
    than the size check assumes; serving must not fail where streaming
    would have worked.  Only allocator exhaustion is downgraded; any other
    failure is a real bug and re-raises."""
    if limit_gb > 0 and frames.nbytes <= limit_gb * 1e9:
        import sys

        import jax

        try:
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                if (
                    frames.shape[-2] % mesh.shape["lat"]
                    or frames.shape[-1] % mesh.shape["lon"]
                ):
                    # raw grid doesn't tile the mesh: stream from host and
                    # let the rollout's own placement shard each chunk
                    return frames
                spec = P(*([None] * (frames.ndim - 2)), "lat", "lon")
                return jax.block_until_ready(
                    jax.device_put(frames, NamedSharding(mesh, spec))
                )
            return jax.block_until_ready(jax.device_put(frames))
        except Exception as e:
            msg = str(e)
            if not (
                "RESOURCE_EXHAUSTED" in msg
                or "Resource exhausted" in msg
                or "out of memory" in msg.lower()
            ):
                raise
            print(
                f"serve: device-resident upload of {frames.nbytes/1e9:.2f} "
                f"GB failed ({type(e).__name__}); streaming chunks from "
                "host instead (--resident-gb 0 silences this)",
                file=sys.stderr,
            )
    return frames


def _build_mesh(lat: int, lon: int, padded_shape):
    """Validate and build the (1, lat, lon) serving mesh with CLI-grade
    errors (raw tracebacks from make_mesh/shard_map are not actionable)."""
    import jax

    from nasa_niswan_tpu.parallel.mesh import make_mesh

    n = jax.device_count()
    if lat < 1 or lon < 1 or lat * lon != n:
        raise SystemExit(
            f"--sharded {lat} {lon}: lat*lon must equal the device count "
            f"({n} visible)"
        )
    H, W = padded_shape
    if H % lat or W % lon:
        raise SystemExit(
            f"--sharded {lat} {lon}: the padded grid {H}x{W} must tile "
            f"evenly (H % lat == 0 and W % lon == 0)"
        )
    return make_mesh(dp=1, lat=lat, lon=lon)


def _write_predictions(
    path: str, preds: np.ndarray, species: str, *, t0_index: int, fmt: str
) -> str:
    """Predictions -> netCDF with CF no-leap time + lat/lon coordinates,
    under the packed-file concentration variable name (data/catalog.py
    PACKED_VARS) so downstream tooling reads it like E33OMA output."""
    from nasa_niswan_tpu.core.grid import GridSpec
    from nasa_niswan_tpu.data.catalog import PACKED_VARS
    from nasa_niswan_tpu.data.ncio import write_nc

    T, h, w = preds.shape
    grid = GridSpec(nlat=h, nlon=w)
    var = PACKED_VARS.get(species, (None, f"{species}_conc"))[1]
    # model step = 30 minutes (dataset.py:146-151); time in hours since the
    # stream origin, offset by where this invocation started
    tvals = (t0_index + np.arange(T, dtype=np.float64)) * 0.5
    return write_nc(
        path,
        {"time": T, "lat": h, "lon": w},
        {
            var: (("time", "lat", "lon"), preds.astype(np.float32)),
            "lat": (("lat",), grid.lat.astype(np.float32)),
            "lon": (("lon",), grid.lon.astype(np.float32)),
        },
        time_values=tvals,
        fmt=fmt,
    )


def main(argv=None):
    from nasa_niswan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(
        description="Serve a trained emulator: compiled chunked rollout -> netCDF."
    )
    p.add_argument("--run-dir", required=True,
                   help="snapshot dir holding configurations.json + epoch-NNN/")
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch checkpoint to load (default: latest)")
    p.add_argument("--period", default="test",
                   choices=("train", "val", "test"),
                   help="which split supplies the forcing stream")
    p.add_argument("--steps", type=int, default=None,
                   help="serve this many steps (default: the whole stream)")
    p.add_argument("--skip", type=int, default=0,
                   help="skip this many leading stream steps (use with "
                        "--state-in to continue a previous invocation)")
    p.add_argument("--chunk", type=int, default=480,
                   help="steps per compiled chunk (one trace, re-dispatched)")
    p.add_argument("--out", default=None,
                   help="output netCDF path (default: <run-dir>/predictions.nc)")
    p.add_argument("--fmt", default="netcdf3",
                   choices=("netcdf3", "netcdf4", "cdf5"))
    p.add_argument("--state-in", default=None,
                   help="resume the rollout carry from this .npz")
    p.add_argument("--state-out", default=None,
                   help="persist the final carry to this .npz (requires "
                        "steps %% chunk == 0: a repeat-padded tail would "
                        "advance the carry over padding frames)")
    p.add_argument("--artifact", default=None,
                   help="serve this frozen exported rollout (rollout/export.py) "
                        "instead of live-jitting the checkpoint (LSTM "
                        "open-loop snapshots only)")
    p.add_argument("--resident-gb", type=float, default=4.0,
                   help="upload the whole forcing stream to the device once "
                        "when it fits in this many GB (0 disables); avoids "
                        "per-chunk host uploads, which dominate serving "
                        "wall time over slow links")
    p.add_argument("--sharded", nargs=2, type=int, default=None,
                   metavar=("LAT", "LON"),
                   help="shard the grid over a (lat, lon) device mesh "
                        "(LAT*LON must equal the device count); serves the "
                        "explicit-halo shard_map rollout — open-loop via "
                        "parallel/spatial.make_sharded_rollout_fn, "
                        "closed-loop via make_sharded_feedback_rollout")
    args = p.parse_args(argv)
    _positive("--chunk", args.chunk)
    if args.steps is not None:
        _positive("--steps", args.steps)
    if args.skip < 0:
        raise SystemExit(f"--skip must be >= 0, got {args.skip}")

    from nasa_niswan_tpu.evalx.snapshot import load_snapshot
    from nasa_niswan_tpu.rollout.export import (
        load_rollout_state,
        save_rollout_state,
    )

    snap = load_snapshot(args.run_dir, epoch=args.epoch, period=args.period)
    out_path = args.out or os.path.join(args.run_dir, "predictions.nc")
    ds, cfg = snap.dataset, snap.cfg

    state_in = prev_in = None
    if args.state_in:
        state_in, prev_in = load_rollout_state(args.state_in)

    recurrent = snap.bundle.is_sequence
    if args.sharded:
        if args.artifact:
            raise SystemExit(
                "--sharded serves the live shard_map rollout; a frozen "
                "--artifact is a single-device program"
            )
        if not recurrent or snap.feedback_single:
            raise SystemExit(
                "--sharded applies to LSTM-family snapshots (the recurrent "
                f"scan is what shards); this is {snap.bundle.family}"
            )
    if not recurrent or snap.feedback_single:
        # single-step families have no recurrent carry to persist
        for flag, name in ((args.state_in, "--state-in"),
                           (args.state_out, "--state-out"),
                           (args.artifact, "--artifact")):
            if flag:
                raise SystemExit(
                    f"{name} applies to LSTM-family snapshots; "
                    f"this is {snap.bundle.family}"
                )

    t_serve = time.perf_counter()
    if snap.closed_loop:
        preds, final_state, prev_norm, t0 = _serve_closed_loop(
            snap, args, state_in, prev_in
        )
    elif recurrent:
        preds, final_state, t0 = _serve_open_loop(snap, args, state_in)
        prev_norm = None
    else:
        if args.skip or args.steps:
            raise SystemExit(
                "--skip/--steps drive the recurrent stream; single-step "
                "families serve their full split"
            )
        from nasa_niswan_tpu.evalx.evaluate import (
            predict_test_feedback,
            predict_test_set,
        )

        if snap.feedback_single:
            out = predict_test_feedback(
                snap.bundle, snap.params, snap.eval_state, ds,
                padded_shape=snap.padded_shape,
            )
        else:
            out = predict_test_set(
                snap.bundle, snap.params, snap.eval_state, ds,
                padded_shape=snap.padded_shape, static=snap.static,
            )
        preds, final_state, prev_norm, t0 = out["PDs"], None, None, 0
    elapsed = time.perf_counter() - t_serve

    if args.state_out and final_state is not None:
        save_rollout_state(args.state_out, final_state, prev_norm=prev_norm)

    _write_predictions(
        out_path, preds, cfg.species, t0_index=t0, fmt=args.fmt
    )
    from nasa_niswan_tpu.rollout.autoregressive import model_days_per_min

    summary = {
        "steps": int(preds.shape[0]),
        "elapsed_s": round(elapsed, 3),
        "model_days_per_min": round(
            model_days_per_min(preds.shape[0], elapsed, batch=1), 2
        ),
        "route": (
            "closed_loop" if snap.closed_loop
            else "open_loop" if recurrent
            else "single_step"
        ),
        "cold_start": args.state_in is None,
        # a cold recurrent carry spins up over the first window
        "suggested_spinup_steps": (
            0 if (args.state_in or not recurrent or snap.closed_loop)
            else cfg.sequence_length - 1
        ),
        "out": out_path,
    }
    with open(os.path.join(args.run_dir, "serve_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


def _serve_open_loop(snap, args, state_in):
    """Configs #1/#2: the compiled autoregressive rollout over the raw
    forcing stream, chunked with a carried state."""
    from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn

    ds, cfg = snap.dataset, snap.cfg
    frames, _ = ds.forcing_stream()  # (T_total, C, h, w) raw dynamic chans
    frames = _slice_stream(frames, args.skip, args.steps)
    T = frames.shape[0]
    grid_shape = tuple(ds[0][1].shape[-2:])

    mesh = None
    if args.artifact:
        from nasa_niswan_tpu.rollout.export import (
            initial_rollout_state,
            load_rollout_info,
        )

        fn, sig = load_rollout_info(args.artifact)
        if sig[0] != 1 or sig[2] != frames.shape[1]:
            raise SystemExit(
                f"artifact signature {sig} does not match the stream "
                f"(batch 1, {frames.shape[1]} channels)"
            )
        chunk = sig[1]
        if args.state_out and T % chunk:
            raise SystemExit(
                f"--state-out needs steps ({T}) divisible by the artifact's "
                f"chunk ({chunk})"
            )
        state = (
            state_in
            if state_in is not None
            else initial_rollout_state(
                snap.bundle.config, 1, snap.padded_shape
            )
        )
        run = lambda st, x_chunk: fn(x_chunk[None], st)[::-1]  # noqa: E731
    else:
        chunk = min(args.chunk, T)
        if args.state_out and T % chunk:
            raise SystemExit(
                f"--state-out needs steps ({T}) divisible by --chunk "
                f"({chunk}): the repeat-padded tail chunk would advance "
                "the carry over padding frames"
            )
        if args.sharded:
            from nasa_niswan_tpu.parallel.spatial import (
                make_sharded_rollout_fn,
            )

            mesh = _build_mesh(*args.sharded, snap.padded_shape)
            rollout = make_sharded_rollout_fn(
                snap.bundle.config, ds.normalizer, mesh,
                padded_shape=snap.padded_shape, grid_shape=grid_shape,
                static=snap.static,
            )
        else:
            rollout = make_rollout_fn(
                snap.bundle.config, ds.normalizer,
                padded_shape=snap.padded_shape, grid_shape=grid_shape,
                static=snap.static,
            )
        state = state_in  # None -> zero init inside convlstm_apply
        run = lambda st, x_chunk: rollout(  # noqa: E731
            snap.params, x_chunk[None], st
        )[::-1]

    from nasa_niswan_tpu.evalx.evaluate import run_chunked_episode_carry

    frames = _device_resident(frames, args.resident_gb, mesh)

    def run_chunk(st, x_chunk):  # adapt (state, (1,T,h,w)) -> carry protocol
        st, p = run(st, x_chunk)
        return st, p[0]

    # clamp_chunk=False: an artifact's chunk is its frozen trace length and
    # must not shrink to a short stream (the live path pre-clamps above)
    preds, (state,) = run_chunked_episode_carry(
        run_chunk, [state], frames, chunk, clamp_chunk=False
    )
    return preds, state, args.skip


def _serve_closed_loop(snap, args, state_in, prev_in):
    """Config #3: the feedback channel carries the model's own previous
    prediction; re-seeded from ground truth only at a cold start
    (test.ipynb cell 8's ``counter != 1`` semantics)."""
    from nasa_niswan_tpu.evalx.evaluate import (
        make_closed_loop_chunk,
        run_chunked_episode_carry,
        zero_closed_loop_state,
    )

    ds = snap.dataset
    frames, prev0, targets = ds.continuous_stream()
    norm = ds.normalizer
    grid_shape = tuple(targets.shape[-2:])
    if args.state_in and prev_in is None:
        raise SystemExit(
            "--state-in carry lacks the feedback frame (prev_norm): it was "
            "saved from an open-loop rollout, not a seq2seq episode"
        )
    if state_in is None:
        state = zero_closed_loop_state(snap.bundle.config, snap.padded_shape)
        # cold start at an offset re-seeds feedback from the analysis
        # (ground truth) at that step, like cell 8's first iteration
        seed = prev0 if args.skip == 0 else targets[args.skip - 1]
        prev_norm = np.asarray(norm.normalize_y(seed), np.float32)[None]
    else:
        state, prev_norm = state_in, prev_in

    frames = _slice_stream(frames, args.skip, args.steps)
    T = frames.shape[0]
    chunk = min(args.chunk, T)
    if args.state_out and T % chunk:
        raise SystemExit(
            f"--state-out needs steps ({T}) divisible by --chunk ({chunk}): "
            "the repeat-padded tail chunk would advance the carry over "
            "padding frames"
        )
    mesh = None
    if args.sharded:
        from nasa_niswan_tpu.parallel.spatial import (
            make_sharded_feedback_rollout,
        )

        mesh = _build_mesh(*args.sharded, snap.padded_shape)
        run_chunk = make_sharded_feedback_rollout(
            snap.bundle.config, norm, mesh,
            padded_shape=snap.padded_shape, grid_shape=grid_shape,
        )
    else:
        run_chunk = make_closed_loop_chunk(
            snap.bundle.config, norm,
            padded_shape=snap.padded_shape, grid_shape=grid_shape,
        )
    preds, (state, prev_norm) = run_chunked_episode_carry(
        lambda st, prev, x: run_chunk(snap.params, st, prev, x),
        [state, prev_norm],
        _device_resident(frames, args.resident_gb, mesh),
        chunk,
    )
    return preds, state, prev_norm, args.skip


if __name__ == "__main__":
    main()
