"""Multi-tracer serving (BASELINE config #5).

The reference trains one emulator per species (train.py --species).  For
in-line surrogate use, ModelE needs all tracers every timestep — so the
TPU-native serving mode runs S per-species emulators as ONE compiled
program: parameters and normalization constants are stacked on a leading
species axis, and the species axis is unrolled at TRACE time into S scans
inside one jitted rollout (one launch, one stacked carry pytree).

Deliberately NOT ``jax.vmap`` over the stacked parameters: vmapping the
parameter pytree batches the conv *filters*, which XLA lowers as grouped
convolutions that measured ~6x slower on TPU than S plain convs (5.1 vs
0.9 ms/step for S=3 at canonical surface shapes).  The shared-met variant
additionally prepares the meteorology tensor once, reused by all S scans.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nasa_niswan_tpu.data.dataset import Normalizer
from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig


def stack_params(params_list: Sequence) -> dict:
    """Stack S identical-structure parameter pytrees on a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def stack_normalizers(norms: Sequence[Normalizer]) -> Normalizer:
    """Stack per-species normalization constants: (S, C) / (S,) arrays in a
    Normalizer whose fields broadcast under vmap."""
    return Normalizer(
        x_mean=np.stack([n.x_mean for n in norms]),
        x_std=np.stack([n.x_std for n in norms]),
        y_mean=np.stack([np.float32(n.y_mean) for n in norms]),
        y_std=np.stack([np.float32(n.y_std) for n in norms]),
    )


def _split_state(state, s: int):
    """Per-species view of the stacked (S, ...) carry, or None."""
    if state is None:
        return None
    return [(h[s], c[s]) for h, c in state]


def _stack_states(states):
    """Per-species carries -> stacked (S, ...) carry (layer-major)."""
    return [
        (
            jnp.stack([st[li][0] for st in states]),
            jnp.stack([st[li][1] for st in states]),
        )
        for li in range(len(states[0]))
    ]


def make_multitracer_rollout(
    config: ConvLSTMConfig,
    normalizers: Sequence[Normalizer],
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    cell_impl: str | None = "auto",
):
    """Compiled rollout over S species at once.

    Returns ``rollout(stacked_params, forcings, state=None)`` with
    ``forcings`` (S, B, T, C, H, W) — per-species forcing streams (the
    meteorology repeats; the emission channel differs per species) — and
    output (S, B, T, h, w) physical-unit predictions + stacked carry.

    The species axis is unrolled at TRACE time (S scans in one jitted
    program), NOT vmapped: vmapping over the parameter pytree batches the
    conv *filters*, which XLA lowers as grouped convolutions that run ~6x
    slower on TPU than S plain convs (measured 5.1 vs 0.9 ms/step for S=3
    at canonical surface shapes).  ``cell_impl`` follows the same auto
    policy as make_rollout_fn, applied at the per-species batch size.
    """
    from nasa_niswan_tpu.rollout.autoregressive import resolve_cell_impl

    norms = [
        (
            np.asarray(n.x_mean, np.float32),
            np.asarray(n.x_std, np.float32),
            np.float32(n.y_mean),
            np.float32(n.y_std),
        )
        for n in normalizers
    ]

    def single_dyn(cfg, params, forcings, x_mean, x_std, y_mean, y_std, state):
        from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
        from nasa_niswan_tpu.models.convlstm import convlstm_apply
        from nasa_niswan_tpu.ops.conv import conv2d

        x = (forcings - x_mean.reshape(-1, 1, 1)) / x_std.reshape(-1, 1, 1)
        x = jnp.moveaxis(pad_geo(x, padded_shape), -3, -1)
        compute_dtype = jnp.dtype(cfg.compute_dtype)

        def tap(h_last):
            p = conv2d(
                h_last.astype(compute_dtype),
                params["head"]["w"].astype(compute_dtype),
                params["head"]["b"],
            ).astype(jnp.float32)
            return crop_to_grid(p[..., 0], grid_shape) * y_std + y_mean

        _, preds, new_state = convlstm_apply(
            params, x, cfg, return_per_step=True, initial_state=state,
            return_state=True, tap_fn=tap,
        )
        return preds, new_state

    @jax.jit
    def rollout(stacked_params, forcings, state=None):
        S, B = forcings.shape[:2]
        cfg = resolve_cell_impl(config, B, cell_impl)
        preds, new_states = [], []
        for s in range(S):
            p_s = jax.tree.map(lambda x: x[s], stacked_params)
            out, ns = single_dyn(
                cfg, p_s, forcings[s], *norms[s], _split_state(state, s)
            )
            preds.append(out)
            new_states.append(ns)
        return jnp.stack(preds), _stack_states(new_states)

    return rollout


def make_multitracer_rollout_shared(
    config: ConvLSTMConfig,
    normalizers: Sequence[Normalizer],
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    cell_impl: str | None = "auto",
):
    """Multi-tracer rollout with DE-DUPLICATED forcings.

    ``make_multitracer_rollout`` takes (S, B, T, C, H, W) — S copies of the
    meteorology channels that are in fact identical across species.  Here
    the inputs split by what actually differs:

        met:       (B, T, C-1, H, W)  shared u/v/omega/prec[, levels]
        emissions: (S, B, T, H, W)    per-species source fields

    The meteorology is normalized/padded ONCE (unbatched under the species
    vmap — XLA computes it a single time) and each scan step concatenates
    the shared met frame with the species' emission channel inside the scan
    body (models/convlstm.convlstm_apply tuple-input support), so HBM cost
    per added species is the emission stream + carry state only.  At 20
    levels x long chunks this is what keeps config #5 under the allocator
    ceiling (docs/STATUS.md r1 gap #2).

    Meteorology stats are shared across species (they are the same
    variables; species JSONs differ only in src/conc slots) — species 0's
    values are used.  The emission slot (last input channel) stays
    per-species.

    Like make_multitracer_rollout, the species axis is a trace-time unroll,
    not a vmap (vmapped filters = slow grouped convs on TPU); the shared
    met tensor is prepared once and reused by all S scans.
    """
    from nasa_niswan_tpu.rollout.autoregressive import resolve_cell_impl

    met_mean = np.asarray(normalizers[0].x_mean[:-1], np.float32)
    met_std = np.asarray(normalizers[0].x_std[:-1], np.float32)
    emis_stats = [
        (
            np.float32(n.x_mean[-1]),
            np.float32(n.x_std[-1]),
            np.float32(n.y_mean),
            np.float32(n.y_std),
        )
        for n in normalizers
    ]

    def single_dyn(cfg, params, met_xs, emis, e_mean, e_std, y_mean, y_std,
                   state):
        from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
        from nasa_niswan_tpu.models.convlstm import convlstm_apply
        from nasa_niswan_tpu.ops.conv import conv2d

        compute_dtype = jnp.dtype(cfg.compute_dtype)
        e = ((emis - e_mean) / e_std).astype(compute_dtype)
        e = pad_geo(e, padded_shape)[..., None]  # (B, T, H, W, 1)

        def tap(h_last):
            p = conv2d(
                h_last.astype(compute_dtype),
                params["head"]["w"].astype(compute_dtype),
                params["head"]["b"],
            ).astype(jnp.float32)
            return crop_to_grid(p[..., 0], grid_shape) * y_std + y_mean

        _, preds, new_state = convlstm_apply(
            params, (met_xs, e), cfg, return_per_step=True,
            initial_state=state, return_state=True, tap_fn=tap,
        )
        return preds, new_state

    @jax.jit
    def rollout(stacked_params, met, emissions, state=None):
        S, B = emissions.shape[:2]
        cfg = resolve_cell_impl(config, B, cell_impl)
        from nasa_niswan_tpu.core.padding import pad_geo

        compute_dtype = jnp.dtype(cfg.compute_dtype)
        m = (met - met_mean.reshape(-1, 1, 1)) / met_std.reshape(-1, 1, 1)
        m = m.astype(compute_dtype)
        met_xs = jnp.moveaxis(pad_geo(m, padded_shape), -3, -1)  # (B,T,H,W,Cm)
        preds, new_states = [], []
        for s in range(S):
            p_s = jax.tree.map(lambda x: x[s], stacked_params)
            out, ns = single_dyn(
                cfg, p_s, met_xs, emissions[s], *emis_stats[s],
                _split_state(state, s),
            )
            preds.append(out)
            new_states.append(ns)
        return jnp.stack(preds), _stack_states(new_states)

    return rollout
