"""Test-period evaluation pipeline — the programmatic equivalent of the
reference's test.ipynb (cells 6-17: load checkpoint, stream the test set,
un-normalize, compute the R^2 family, save test-results.npy).

Two inference modes for recurrent models:

  * ``mode="windowed"`` — exact reference semantics: every test step is
    predicted from its own sequence window starting at zero state
    (E33OMA_CRNN windows, dataset.py:543-545; test.ipynb cell 8).  O(T * L)
    work for window length L.
  * ``mode="rollout"`` — the TPU-native serving path: one compiled
    state-carrying rollout over the whole test period
    (rollout/autoregressive.py).  O(T) work; state never resets, which is
    the in-line-surrogate behavior (and typically scores at least as well
    after the first day of warm-up).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from nasa_niswan_tpu.data.dataset import SequenceDataset
from nasa_niswan_tpu.data.pipeline import (
    ChunkDrain,
    batch_iterator,
    device_prefetch,
)
from nasa_niswan_tpu.evalx import metrics as M
from nasa_niswan_tpu.models.registry import ModelBundle
from nasa_niswan_tpu.train.loop import make_eval_step


def predict_test_set(
    bundle: ModelBundle,
    params,
    state,
    dataset,
    *,
    padded_shape,
    batch_size: int = 8,
    static: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Windowed inference over a test dataset; returns physical-unit GTs/PDs
    shaped (N, H, W) (the reference's GTs/PDs buffers, test.ipynb cell 8).

    Sequence datasets stream device-resident: windows overlap by seq-1, so
    host batching re-sends every frame ~seq times (measured ~44 GB over the
    host link for a 241-window test pass that is a 0.9 GB slab resident).
    """
    norm = dataset.normalizer
    grid_shape = tuple(dataset[0][1].shape[-2:])
    if hasattr(dataset, "forcing_stream"):
        import jax.numpy as jnp

        from nasa_niswan_tpu.train.loop import (
            DeviceWindowSource,
            make_device_eval_step,
        )

        src = DeviceWindowSource(dataset)
        eval_step = make_device_eval_step(
            bundle, norm, src, padded_shape=padded_shape,
            grid_shape=grid_shape, static=static, unnormalize=True,
        )
        drain = ChunkDrain()  # fetch one batch behind the dispatch
        for s in range(0, src.n, batch_size):
            idx = np.arange(s, min(s + batch_size, src.n))
            n_valid = len(idx)
            if n_valid < batch_size:  # pad to keep shapes static
                idx = np.concatenate(
                    [idx, np.repeat(idx[-1:], batch_size - n_valid)]
                )
            _, pred = eval_step(params, state, jnp.asarray(idx, jnp.int32))
            drain.push(pred, lambda d, n=n_valid: np.asarray(d)[:n])
        gts = np.asarray(src.targets)
        return {"GTs": gts, "PDs": np.concatenate(drain.finish())}
    eval_step = make_eval_step(
        bundle, norm, padded_shape=padded_shape, grid_shape=grid_shape,
        static=static, unnormalize=True,
    )
    gts = []  # captured HOST-side before the H2D upload: no D2H round trip

    def record_targets(batches):
        for x, y in batches:
            gts.append(y)
            yield x, y

    drain = ChunkDrain()  # fetch one batch behind the dispatch
    for x_raw, y_raw in device_prefetch(
        record_targets(
            batch_iterator(dataset, batch_size, shuffle=False, drop_last=False)
        )
    ):
        _, pred = eval_step(params, state, x_raw, y_raw)
        drain.push(pred)
    return {"GTs": np.concatenate(gts), "PDs": np.concatenate(drain.finish())}


def predict_test_rollout(
    config, params, dataset: SequenceDataset, *, padded_shape, static=None
) -> Dict[str, np.ndarray]:
    """State-carrying rollout over the test period of a SequenceDataset."""
    from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn

    norm = dataset.normalizer
    grid_shape = tuple(dataset[0][1].shape[-2:])
    rollout = make_rollout_fn(
        config, norm, padded_shape=padded_shape, grid_shape=grid_shape,
        static=static, unnormalize=True,
    )
    frames, targets = dataset.forcing_stream()
    preds, _ = rollout(params, frames[None])
    preds = np.asarray(preds)[0, dataset.seq_len - 1 :]
    return {"GTs": targets, "PDs": preds}


def _run_chunked_episode(run_chunk, carry, frames, chunk_steps: int):
    """Drive a jitted fixed-size-chunk closed-loop episode over ``frames``
    (T leading): repeat-pad the tail chunk so the trace stays static,
    thread the carry through every chunk (ONE continuous episode, no
    resets at chunk boundaries), trim the padding from the outputs.

    ``run_chunk(*carry, x_chunk) -> (*carry, preds)``.  Shared by the
    seq2seq and the UNet-6ch feedback evaluators.  Returns ``preds`` only;
    note a repeat-padded tail chunk advances the carry over the padding
    frames, so the final carry is NOT valid for continuation unless
    ``T % chunk_steps == 0`` (the serving CLI enforces this for
    ``--state-out``)."""
    preds, _ = run_chunked_episode_carry(run_chunk, carry, frames, chunk_steps)
    return preds


def run_chunked_episode_carry(
    run_chunk, carry, frames, chunk_steps: int, *, clamp_chunk: bool = True
):
    """`_run_chunked_episode` that also returns the final carry (see its
    tail-padding caveat).  ``clamp_chunk=False`` keeps an oversized
    ``chunk_steps`` as the trace length (repeat-padding a short stream up
    to it) — required when the chunk size is baked into a frozen exported
    artifact and cannot shrink to the stream.

    Software-pipelined one chunk deep: chunk k+1 is DISPATCHED before chunk
    k's predictions are fetched, so the device computes the next chunk
    while the host drains the previous one (JAX dispatch is async; the
    carry never leaves the device).  Chaining dispatches this way is what
    takes closed-loop serving from the 0.50 ms/step single-dispatch wall
    to 0.311 ms/step sustained (`scripts/profile_closed_loop.py --chain`);
    the pred fetch itself (~25 MB/chunk) rides PCIe behind the next
    chunk's compute on a pod host — through the ~35 MB/s dev tunnel it
    dominates wall either way (measured tied, docs/PERFORMANCE.md)."""
    T = frames.shape[0]
    if clamp_chunk:
        chunk_steps = min(chunk_steps, T)
    drain = ChunkDrain()
    for s in range(0, T, chunk_steps):
        x_chunk = frames[s : s + chunk_steps]
        n_valid = x_chunk.shape[0]
        *carry, p = run_chunk(*carry, pad_tail_chunk(x_chunk, chunk_steps))
        drain.push(p, lambda d, n=n_valid: np.asarray(d)[:n])
    return np.concatenate(drain.finish()), carry


def pad_tail_chunk(x_chunk, chunk: int):
    """Repeat-pad a short tail chunk (leading time axis) to the static trace
    length.  jnp ops so a device-resident stream pads on device (the serving
    CLI uploads the stream once, ``--resident-gb``); shared by the episode
    runner above and the open-loop serve loop (rollout/__main__.py)."""
    import jax.numpy as jnp

    n_valid = x_chunk.shape[0]
    if n_valid == chunk:
        return x_chunk
    return jnp.concatenate(
        [x_chunk, jnp.repeat(x_chunk[-1:], chunk - n_valid, axis=0)]
    )


def make_closed_loop_chunk(config, normalizer, *, padded_shape, grid_shape):
    """The jitted closed-loop chunk of a seq2seq snapshot: scan a raw
    forcing chunk with the feedback channel carrying the model's OWN
    previous prediction (test.ipynb cell 8's ``X[:, -1] = pred``, run
    continuously).  Returns ``run_chunk(params, state, prev_norm, x_chunk)
    -> (state, prev_norm, preds)`` with x_chunk raw (Tc, C-1, h, w),
    prev_norm (1, h, w) normalized, preds (Tc, h, w) physical units.
    Shared by the evaluation (`predict_test_closed_loop`) and serving
    (``python -m nasa_niswan_tpu.rollout``) paths.

    Implemented as a NATIVE scan (not a per-step T=1 ``convlstm_apply``):
    the met channels are normalized/padded/cast once per chunk and the
    (h, c) carry stays in the kernel layout for the whole scan — only the
    one-channel feedback frame is rebuilt per step (pad_geo of the previous
    prediction).  Measured at config-#3 shapes on the v5e chip,
    device-resident inputs: **0.50 ms/step (~2,400 model-days/min)** with
    the fused pallas2 cells, 0.59 with XLA — statistically tied with the
    per-step-apply form (XLA fuses that form's per-step entry/exit layout
    conversions away); the naive wall-clock "6.5 ms/step" both forms show
    through the dev tunnel is the 125 MB/chunk forcing upload, not compute
    (production pattern: upload year blocks once, slice on device, like
    scripts/run_decadal_rollout.py).  The native scan is kept for its
    structural guarantees (no reliance on the compiler eliding the churn)
    and its symmetry with the sharded feedback body
    (parallel/spatial.make_sharded_feedback_rollout).  Every cell_impl is
    routed (``resolve_auto_impl`` at the traced B=1)."""
    import jax
    import jax.numpy as jnp

    from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
    from nasa_niswan_tpu.models.convlstm import (
        _cell_step_xla,
        resolve_auto_impl,
    )
    from nasa_niswan_tpu.ops.conv import conv2d

    norm = normalizer
    x_mean = jnp.asarray(norm.x_mean).reshape(-1, 1, 1)
    x_std = jnp.asarray(norm.x_std).reshape(-1, 1, 1)
    dt = jnp.dtype(config.compute_dtype)
    W = padded_shape[1]

    impl = config.cell_impl
    if impl == "auto":
        impl = resolve_auto_impl(1, mode="forward")
    pallas2 = impl == "pallas2"
    if pallas2:
        from nasa_niswan_tpu.ops.convlstm_pallas2 import (
            cell_step_pallas2,
            col_margin,
            pad_cols,
            padded_cols,
        )

        o2 = col_margin(config.kernel_sizes)
        wp = padded_cols(W, o2)
        cell_step = lambda cell, xt, h, c, k: cell_step_pallas2(  # noqa: E731
            cell, xt, h, c, k, dt, o2, W
        )
    elif impl == "pallas":  # v1 shifted-window kernel, standard layout
        from nasa_niswan_tpu.ops.convlstm_pallas import cell_step_pallas

        o2 = 0
        cell_step = lambda cell, xt, h, c, k: cell_step_pallas(  # noqa: E731
            cell, xt, h, c, k, dt
        )
    else:
        o2 = 0
        cell_step = lambda cell, xt, h, c, k: _cell_step_xla(  # noqa: E731
            cell, xt, h, c, k, dt
        )

    @jax.jit
    def run_chunk(params, state, prev_norm, x_chunk):
        # x_chunk: raw (Tc, C-1, h, w); prev_norm: (1, h, w) normalized
        xn = (x_chunk - x_mean) / x_std
        # (Tc, 1, H, W, C-1) in the compute dtype, once per chunk
        xs = jnp.moveaxis(pad_geo(xn, padded_shape), 1, -1)[:, None]
        xs = xs.astype(dt)
        state = [tuple(s) for s in state]
        if pallas2:
            xs = pad_cols(xs, o2, wp)
            if state[0][0].shape[2] == W:  # standard-layout carry handover
                state = [
                    (pad_cols(h, o2, wp), pad_cols(c, o2, wp))
                    for h, c in state
                ]

        def step(carry, x_t):
            st, prev = carry  # prev: (1, h, w) f32 normalized
            fb = pad_geo(prev, padded_shape).astype(dt)[..., None]
            if pallas2:
                fb = pad_cols(fb, o2, wp)
            inp = jnp.concatenate([x_t, fb], axis=-1)  # (1, H, W', C)
            new_st = []
            for li in range(config.num_layers):
                h, c = st[li]
                h, c = cell_step(
                    params["cells"][li], inp, h, c, config.kernel_sizes[li]
                )
                new_st.append((h, c))
                inp = h
            tap_in = inp[:, :, o2 : o2 + W, :] if pallas2 else inp
            pred_pad = conv2d(
                tap_in.astype(dt),
                params["head"]["w"].astype(dt),
                params["head"]["b"],
            ).astype(jnp.float32)
            pred = crop_to_grid(pred_pad[..., 0], grid_shape)  # (1, h, w)
            return (new_st, pred), pred

        (state, prev_norm), preds_n = jax.lax.scan(
            step, (state, prev_norm), xs
        )
        if pallas2:  # return the carry in the standard layout (see _finish)
            state = [
                (h[:, :, o2 : o2 + W, :], c[:, :, o2 : o2 + W, :])
                for h, c in state
            ]
        return state, prev_norm, norm.unnormalize_y(preds_n[:, 0])

    return run_chunk


def zero_closed_loop_state(config, padded_shape):
    """Zero (h, c) carry for the closed-loop chunk (model.py:258-262)."""
    H, W = padded_shape
    return [
        (
            np.zeros((1, H, W, hc), np.float32),
            np.zeros((1, H, W, hc), np.float32),
        )
        for hc in config.hidden_channels
    ]


def predict_test_closed_loop(
    config, params, dataset, *, padded_shape, chunk_steps: int = 480
) -> Dict[str, np.ndarray]:
    """Closed-loop feedback evaluation over a ``Seq2SeqDataset``'s full
    split — the deployment condition of a ``--mode seq2seq`` snapshot
    (test.ipynb cell 8's ``X[:, -1] = pred`` loop, run continuously).

    Each step's feedback channel is the model's OWN previous prediction
    (ground truth only seeds step 0 via the dataset's ``prev0``); the
    ConvLSTM (h, c) state and the feedback frame are carried across jitted
    fixed-size chunks, so the whole test period is one continuous episode
    with no state resets at chunk boundaries.  Returns physical-unit
    GTs/PDs shaped (T, h, w).
    """
    frames, prev0, targets = dataset.continuous_stream()
    norm = dataset.normalizer
    grid_shape = tuple(targets.shape[-2:])
    run_chunk = make_closed_loop_chunk(
        config, norm, padded_shape=padded_shape, grid_shape=grid_shape
    )
    state = zero_closed_loop_state(config, padded_shape)
    prev_norm = np.asarray(norm.normalize_y(prev0), np.float32)[None]
    preds = _run_chunked_episode(
        lambda st, prev, x: run_chunk(params, st, prev, x),
        [state, prev_norm], frames, chunk_steps,
    )
    return {"GTs": targets, "PDs": preds}


def predict_test_feedback(
    bundle, params, state, dataset, *, padded_shape, chunk_steps: int = 480
) -> Dict[str, np.ndarray]:
    """Closed-loop feedback evaluation of a 6-channel SINGLE-STEP model
    (UNet-6ch): test.ipynb cell 8's ``X[:, -1] = pred`` loop — channel 5
    of every frame after the first carries the model's OWN previous
    prediction, not the dataset's teacher-forced ground truth.  The
    feedback frame is carried across jitted fixed-size chunks so the test
    period is one continuous episode.  Returns physical-unit GTs/PDs
    shaped (T, h, w)."""
    import jax
    import jax.numpy as jnp

    from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo

    frames, targets = dataset.feedback_stream()  # raw (T, 6, h, w) / (T, h, w)
    if frames.shape[1] != 6:
        raise ValueError("feedback evaluation needs in_channels=6")
    norm = dataset.normalizer
    grid_shape = tuple(targets.shape[-2:])
    T = frames.shape[0]
    chunk_steps = min(chunk_steps, T)

    x_mean = jnp.asarray(norm.x_mean).reshape(-1, 1, 1)
    x_std = jnp.asarray(norm.x_std).reshape(-1, 1, 1)

    @jax.jit
    def run_chunk(params, state, prev_raw, x_chunk):
        # x_chunk: raw (Tc, 6, h, w); prev_raw: (h, w) raw-units feedback
        def step(carry, x_t):
            st, prev = carry
            x_t = x_t.at[5].set(prev)  # cell 8: X[:, -1] = pred
            xn = (x_t - x_mean) / x_std
            frame = jnp.moveaxis(
                pad_geo(xn, padded_shape), 0, -1
            )[None].astype(jnp.float32)  # (1, H, W, 6)
            out, st = bundle.apply(params, st, frame, training=False)
            pred_raw = norm.unnormalize_y(
                crop_to_grid(out[..., 0], grid_shape)[0]
            )
            return (st, pred_raw), pred_raw

        (state, prev_raw), preds = jax.lax.scan(
            step, (state, prev_raw), x_chunk
        )
        return state, prev_raw, preds

    # ground-truth previous concentration seeds only step 0 (counter != 1)
    prev_raw = np.asarray(frames[0, 5], np.float32)
    preds = _run_chunked_episode(
        lambda st, prev, x: run_chunk(params, st, prev, jnp.asarray(x)),
        [state, prev_raw], frames, chunk_steps,
    )
    return {"GTs": targets, "PDs": preds}


def predict_test_hidden(
    config,
    params,
    dataset,
    *,
    padded_shape,
    batch_size: int = 8,
    static: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-window per-step head taps — the reference's HSs buffer
    (test.ipynb cell 8: ``pred, hs = net(X)``, HSs (N, 48, 90, 144)).
    Returns physical-unit (N, T, h, w)."""
    import jax

    from nasa_niswan_tpu.core.padding import crop_to_grid
    from nasa_niswan_tpu.data.dataset import zscore_static
    from nasa_niswan_tpu.models.convlstm import convlstm_apply
    from nasa_niswan_tpu.ops.conv import conv2d
    from nasa_niswan_tpu.rollout.autoregressive import _prep_frame

    norm = dataset.normalizer
    grid_shape = tuple(dataset[0][1].shape[-2:])
    static_z = None if static is None else zscore_static(static)

    @jax.jit
    def run(params, x_raw):
        import jax.numpy as jnp

        xs = _prep_frame(x_raw, norm, static_z, padded_shape)
        dt = jnp.dtype(config.compute_dtype)

        def tap(h_last):
            p = conv2d(
                h_last.astype(dt),
                params["head"]["w"].astype(dt),
                params["head"]["b"],
            ).astype(jnp.float32)
            return norm.unnormalize_y(crop_to_grid(p[..., 0], grid_shape))

        _, taps = convlstm_apply(
            params, xs, config, return_per_step=True, tap_fn=tap
        )
        return taps

    out = []
    for x_raw, _ in batch_iterator(
        dataset, batch_size, shuffle=False, drop_last=False
    ):
        out.append(np.asarray(run(params, x_raw)))
    return np.concatenate(out)


def evaluation_report(
    gts: np.ndarray, pds: np.ndarray, lat, lon, *, unit_scale: float = 1.0
) -> Dict:
    """The reference's metric battery over (N, H, W) ground truth and
    predictions (test.ipynb cells 12-44)."""
    gts = gts * unit_scale
    pds = pds * unit_scale
    temporal = np.asarray(M.r2_temporal(gts, pds))
    spatial = np.asarray(M.r2_spatial(gts, pds))
    weight = gts.mean(axis=0)
    bands = {
        "tropical": (-21, 21),
        "northern_mid": (21, 61),
        "northern_polar": (61, 90),
        "southern_mid": (-61, -21),
        "southern_polar": (-90, -61),
    }
    band_r2 = {
        name: float(M.lat_band_weighted_r2(spatial, weight, lat, band))
        for name, band in bands.items()
    }
    regions = {}
    for region in M.REGIONS:
        g = np.asarray(M.regional_slice(gts, lat, lon, region))
        p = np.asarray(M.regional_slice(pds, lat, lon, region))
        regions[region] = float(M.r2(g, p))
    return {
        "temporal_r2": temporal,
        "temporal_r2_summary": {
            "mean": float(temporal.mean()),
            "median": float(np.median(temporal)),
            "max": float(temporal.max()),
            "min": float(temporal.min()),
        },
        "spatial_r2": spatial,
        "band_weighted_r2": band_r2,
        "regional_r2": regions,
        "pearson_r": float(M.pearson_r(gts, pds)),
        "global_r2": float(M.r2(gts, pds)),
    }


def monthly_breakdown(
    gts: np.ndarray,
    pds: np.ndarray,
    months: np.ndarray,
    lat,
    lon,
    *,
    which=(2, 8),
) -> Dict[int, Dict[str, float]]:
    """Month-conditioned regional R^2 (test.ipynb cells 36,40: the Feb/Aug
    comparison).  ``months``: (N,) month number per timestep."""
    months = np.asarray(months)
    out: Dict[int, Dict[str, float]] = {}
    for m in which:
        sel = months == m
        if not sel.any():
            continue
        out[m] = {
            region: float(
                M.r2(
                    np.asarray(M.regional_slice(gts[sel], lat, lon, region)),
                    np.asarray(M.regional_slice(pds[sel], lat, lon, region)),
                )
            )
            for region in M.REGIONS
        }
    return out


def save_animation_frames(
    fields: np.ndarray,
    out_dir: str,
    *,
    prefix: str = "frame",
    cmap: str = "viridis",
    every: int = 1,
    projection: Optional[str] = None,
    grid_lat=None,
    grid_lon=None,
) -> int:
    """Export per-timestep maps as PNG frames (test.ipynb cells 31-34's
    animation, without the notebook display loop).  Returns frame count.

    ``projection="robinson"`` (with grid_lat/grid_lon) renders each frame
    through evalx.plots.plot_global_map — the notebook's cartopy Robinson
    frames, rendered via the built-in warp when cartopy is absent."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    vmin, vmax = float(np.min(fields)), float(np.max(fields))
    count = 0
    for t in range(0, len(fields), every):
        path = os.path.join(out_dir, f"{prefix}-{t:05d}.png")
        if projection is not None:
            from nasa_niswan_tpu.evalx.plots import plot_global_map

            if grid_lat is None or grid_lon is None:
                nlat, nlon = fields[t].shape
                grid_lat = np.linspace(-90, 90, nlat)
                grid_lon = np.linspace(-180, 180, nlon, endpoint=False)
            fig = plot_global_map(
                fields[t], grid_lat, grid_lon, projection=projection,
                title=f"t={t}", save_path=path,
                cmap=cmap, vmin=vmin, vmax=vmax,
            )
        else:
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.imshow(fields[t], origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
            ax.set_title(f"t={t}")
            fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        count += 1
    return count


def save_test_results(path_dir: str, gts: np.ndarray, pds: np.ndarray) -> str:
    """test-results.npy with the reference layout: two consecutive np.save's
    (GTs then PDs) in one file (test.ipynb cell 9)."""
    os.makedirs(path_dir, exist_ok=True)
    path = os.path.join(path_dir, "test-results.npy")
    with open(path, "wb") as f:
        np.save(f, gts)
        np.save(f, pds)
    return path


def load_test_results(path: str):
    with open(path, "rb") as f:
        gts = np.load(f)
        pds = np.load(f)
    return gts, pds
