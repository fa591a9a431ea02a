"""Compiled autoregressive rollout — the serving mode and the north-star
benchmark path.

The reference's inference loop (test.ipynb cell 8) streams the test set
batch-by-batch through Python with a device->host sync every step, feeding
the previous prediction back into the input's concentration channel for the
6-channel models.  Here the whole rollout is ONE jitted ``lax.scan``:

  * recurrent (ConvLSTM) models carry their per-layer (h, c) state across
    the scan — each scan step consumes one new frame of forcings and emits
    one prediction, with NO re-processing of a sliding window (the reference
    re-runs all 48 window steps per prediction; carrying state makes each
    emitted step ~48x cheaper, which is where the throughput target lives);
  * feedback models (UNet-6ch) get the previous prediction written into
    their feedback channel on device (cell 8's ``X[:, -1] = pred``);
  * normalization, padding, crop, and un-normalization all live inside the
    scan body, so forcings stream in raw and predictions come out in
    physical units with no host round-trips.

Teacher forcing / scheduled sampling for multi-step seq2seq training
(BASELINE config #3) reuses the same scan body with a per-step mixing
decision.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
from nasa_niswan_tpu.data.dataset import Normalizer, zscore_static
from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_apply


def _prep_frame(x, normalizer, static, padded_shape, cast_dtype=None):
    """Raw forcing frames (..., C, H, W) -> padded NHWC.

    ``cast_dtype``: cast right after normalization (normalize in f32, pad
    and transpose in the compute dtype).  The conv consumes bf16 anyway;
    casting early halves the two largest rollout buffers, which decides
    whether a large-batch chunk fits HBM at all.
    """
    x_mean = jnp.asarray(normalizer.x_mean).reshape(-1, 1, 1)
    x_std = jnp.asarray(normalizer.x_std).reshape(-1, 1, 1)
    x = (x - x_mean) / x_std
    if cast_dtype is not None:
        x = x.astype(cast_dtype)
    if static is not None:
        st = jnp.asarray(static)
        x = jnp.concatenate(
            [x.astype(jnp.float32), jnp.broadcast_to(st, x.shape[:-3] + st.shape)],
            axis=-3,
        ).astype(cast_dtype if cast_dtype is not None else jnp.float32)
    if padded_shape is not None:
        x = pad_geo(x, padded_shape)
    return jnp.moveaxis(x, -3, -1)


def _serving_backend() -> str:
    """The backend cell_impl='auto' keys off (seam for tests)."""
    return jax.default_backend()


def resolve_cell_impl(config, B: int, cell_impl: Optional[str] = "auto"):
    """Per-trace serving-cell policy, shared by the rollout builders
    (single-tracer and multitracer): 'auto' picks the fused pallas2 kernel
    for B<=4 on a real TPU backend and the XLA cell beyond (measured
    crossover, scripts/bench_cell.py); None keeps ``config.cell_impl``;
    any impl name forces it.  Returns a (possibly replaced) config."""
    impl = cell_impl
    if impl == "auto":
        if _serving_backend() == "tpu":
            from nasa_niswan_tpu.models.convlstm import resolve_auto_impl

            impl = resolve_auto_impl(B, backend="tpu")
        else:
            impl = None
    if impl is None or impl == config.cell_impl:
        return config
    import dataclasses

    return dataclasses.replace(config, cell_impl=impl)


def make_rollout_fn(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    collect_taps: bool = False,
    unnormalize: bool = True,
    precompute_input_conv: Optional[bool] = None,
    cell_impl: Optional[str] = "auto",
) -> Callable:
    """Compiled state-carrying rollout for the ConvLSTM emulator.

    Returns ``rollout(params, forcings, initial_state=None)`` where
    ``forcings`` is raw (B, T, C, H, W); the result is (B, T, H, W)
    predictions (physical units when ``unnormalize``) plus the final carry,
    suitable for chunked decadal runs: feed the next forcing chunk with the
    returned state.

    cell_impl="auto" (default) picks the serving cell per traced batch
    size on a real TPU backend: the fused Pallas v2 kernel up to B=4
    (hardware-measured ms/step pallas2-vs-XLA at north-star shapes:
    B=1 0.375/0.524, B=2 0.77/1.05, B=4 2.02/2.23) and the XLA cell
    beyond, where XLA's batched convs win back the lead (B=8: 3.43 vs
    4.29; scripts/bench_cell.py).  Off-TPU, auto keeps the config's own impl
    (the v2 kernel's non-TPU path is the slow Pallas interpreter).  Pass
    None to always respect ``config.cell_impl``, or an impl name to force
    one.  For GSPMD-spatially-sharded serving (sharded forcings/state
    under a mesh) pass None/"xla": a pallas_call is opaque to the GSPMD
    partitioner; the explicit-halo sharded path lives in
    parallel/spatial.make_sharded_rollout_fn.

    precompute_input_conv=None auto-hoists layer 0's input conv out of the
    scan as one (B*T)-batched conv when the hoisted activation buffer
    (B, T, H, W, 4*hidden0) stays under ~4 GB — measured 1.95x rollout
    throughput at the north-star shapes with the XLA cell (the per-step
    batch-1 conv is the MXU-utilization bottleneck; docs/STATUS.md r1 gap
    #2).  The fused kernel never round-trips the gate tensor through HBM,
    so hoisting only adds traffic there (0.46 vs 0.375 ms/step measured) —
    auto keeps it off for pallas2.
    """
    def _effective_config(B: int) -> ConvLSTMConfig:
        return resolve_cell_impl(config, B, cell_impl)

    static_z = None if static is None else zscore_static(static)

    def _auto_hoist(cfg: ConvLSTMConfig, B: int, T: int) -> bool:
        if precompute_input_conv is not None:
            return precompute_input_conv
        if cfg.cell_impl == "pallas2":
            return False
        H, W = padded_shape
        itemsize = 2 if cfg.compute_dtype == "bfloat16" else 4
        hoisted = B * T * H * W * 4 * cfg.hidden_channels[0] * itemsize
        return hoisted < 4 * 1024**3

    @jax.jit
    def rollout(params, forcings, initial_state=None):
        B, T = forcings.shape[:2]
        cfg = _effective_config(B)
        H, W = padded_shape
        if initial_state is None:
            initial_state = [
                (
                    jnp.zeros((B, H, W, hc), jnp.float32),
                    jnp.zeros((B, H, W, hc), jnp.float32),
                )
                for hc in config.hidden_channels
            ]
        # Preprocess ALL frames in one vectorized op before the scan — a
        # per-step pad/transpose inside the scan body costs far more than
        # the cell compute itself (measured ~30x on v5e at batch 1).
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        cast = compute_dtype if compute_dtype != jnp.float32 else None
        xs = _prep_frame(forcings, normalizer, static_z, padded_shape, cast)

        def tap(h_last):
            # head conv + crop + squeeze inside the scan: emitting the
            # (B, h, w) physical-grid map keeps the scan ys minor dim wide
            # (lane-aligned); a (B, H, W, 1) tap costs ~3x (see
            # convlstm_apply docstring).
            from nasa_niswan_tpu.ops.conv import conv2d

            p = conv2d(
                h_last.astype(compute_dtype),
                params["head"]["w"].astype(compute_dtype),
                params["head"]["b"],
            ).astype(jnp.float32)
            p = crop_to_grid(p[..., 0], grid_shape)
            if unnormalize:
                p = normalizer.unnormalize_y(p)
            return p

        _, preds, final_state = convlstm_apply(
            params,
            xs,
            cfg,
            return_per_step=True,
            precompute_input_conv=_auto_hoist(cfg, B, T),
            initial_state=initial_state,
            return_state=True,
            tap_fn=tap,
        )
        return preds, final_state

    return rollout


def make_feedback_rollout_fn(
    apply_fn: Callable,
    normalizer: Normalizer,
    *,
    padded_shape: Tuple[int, int] = (256, 256),
    grid_shape: Tuple[int, int] = (90, 144),
) -> Callable:
    """Closed-loop rollout for feedback models (UNet-6ch, test.ipynb cell 8):
    channel 5 of each step's input is replaced by the previous *prediction*
    (normalized), starting from the dataset-provided first frame.

    ``apply_fn(params, x_nhwc) -> (B, H, W, 1)``; forcings raw (B, T, 6, H, W)
    where channel 5 holds the ground-truth previous concentration (used only
    at t=0, mirroring ``counter != 1`` in cell 8).
    """

    @jax.jit
    def rollout(params, forcings):
        xs = jnp.moveaxis(forcings, 1, 0)
        y_mean, y_std = normalizer.y_mean, normalizer.y_std

        def step(carry, x_t):
            t, prev_pred_norm = carry
            feedback = jnp.where(
                t == 0,
                x_t[:, 5],  # ground-truth prev conc only at the first step
                prev_pred_norm * y_std + y_mean,  # back to raw units
            )
            x_t = x_t.at[:, 5].set(feedback)
            x_nhwc = _prep_frame(x_t, normalizer, None, padded_shape)
            pred = apply_fn(params, x_nhwc)
            pred = crop_to_grid(pred[..., 0], grid_shape)
            return (t + 1, pred), pred * y_std + y_mean

        init = (
            jnp.zeros((), jnp.int32),
            jnp.zeros((forcings.shape[0], *grid_shape), jnp.float32),
        )
        _, preds = jax.lax.scan(step, init, xs)
        return jnp.moveaxis(preds, 0, 1)

    return rollout


def make_streaming_rollout(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    params,
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    batch: int = 1,
):
    """Stateful convenience wrapper for in-line serving inside a host model
    (ModelE surrogate mode): call ``step(forcing_frame)`` once per model
    timestep; state stays on device between calls."""
    rollout = make_rollout_fn(
        config, normalizer, padded_shape=padded_shape, grid_shape=grid_shape,
        static=static,
    )
    state = {"carry": None}

    def step(frame: np.ndarray) -> jax.Array:
        preds, state["carry"] = rollout(
            params, jnp.asarray(frame)[:, None], state["carry"]
        )
        return preds[:, 0]

    return step


def model_days_per_min(
    n_steps: int, elapsed_s: float, *, steps_per_day: int = 48, batch: int = 1
) -> float:
    """The north-star throughput metric: emulated model-days per minute."""
    days = batch * n_steps / steps_per_day
    return days / (elapsed_s / 60.0)
