"""Spatial (grid) sharding — the tensor-parallel analog for a global
lat-lon emulator (BASELINE config #5: multi-tracer decadal rollout with the
grid sharded over a TPU mesh).

Two implementations, one contract:

  * **GSPMD path** (``make_spatial_train_step``): jit the ordinary step body
    with the raw batch sharded (dp, lat, lon) and params replicated.  XLA's
    SPMD partitioner inserts the conv halo exchanges, the pad/crop data
    movement, and the loss/gradient reductions itself.  This is the
    general-purpose path: any model in the zoo works unchanged.

  * **Manual path** (``convlstm_apply_sharded``): the ConvLSTM forward as an
    explicit shard_map program — per-cell convs via
    parallel/halo.sharded_conv2d (one ring ppermute per axis per conv), the
    (h, c) carry living shard-local across the whole lax.scan.  This is the
    hand-tuned serving kernel where the halo schedule is under our control,
    and the parity oracle for the GSPMD path (tests/test_parallel.py checks
    both against the single-device model).

Both compute bit-compatible results with the single-device model: they
shard the reference's *padded* computational domain and reproduce zero-pad
conv semantics at shard boundaries (see parallel/halo.py docstring).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nasa_niswan_tpu.core.padding import crop_to_grid
from nasa_niswan_tpu.data.dataset import Normalizer
from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, gate_update
from nasa_niswan_tpu.models.registry import ModelBundle
from nasa_niswan_tpu.ops.conv import conv2d
from nasa_niswan_tpu.parallel.halo import sharded_conv2d
from nasa_niswan_tpu.train.loop import build_train_step_fn


def make_spatial_train_step(
    bundle: ModelBundle,
    normalizer: Normalizer,
    optimizer,
    mesh: Mesh,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
):
    """GSPMD train step: raw (B, T, C, H, W) batches sharded
    (dp, -, -, lat, lon); XLA partitions the convs with automatic halos."""
    fn = build_train_step_fn(
        bundle, normalizer, optimizer, padded_shape=padded_shape,
        grid_shape=grid_shape, static=static,
    )
    rep = NamedSharding(mesh, P())
    x_sh = NamedSharding(
        mesh,
        P("dp", None, None, "lat", "lon") if bundle.is_sequence
        else P("dp", None, "lat", "lon"),
    )
    y_sh = NamedSharding(mesh, P("dp", "lat", "lon"))
    return jax.jit(
        fn,
        in_shardings=(rep, rep, rep, x_sh, y_sh, rep),
        out_shardings=(rep, rep, rep, rep),
    )


def _vary(z):
    """Mark shard-local zeros as device-varying so scan carry types line up
    under shard_map's varying-manual-axes typing."""
    return jax.lax.pcast(z, ("dp", "lat", "lon"), to="varying")


def _local_convlstm_forward(
    params,
    x_local,
    state,
    config: ConvLSTMConfig,
    collect_taps: bool = False,
    compute_dtype=None,
):
    """shard_map body: ConvLSTM scan on a local (B, T, h, w, C) tile with
    explicit halo-exchange convs.  Mirrors models/convlstm.convlstm_apply
    (same gate math) with sharded convs; the (h, c) carry lives shard-local
    across the whole scan (zero inter-step state movement — the CP analog
    for a recurrent spatial model).

    Returns (pred_last (B,h,w,1), taps (T,B,h,w,1) or None, final state).
    """
    dt = jnp.dtype(compute_dtype or config.compute_dtype)
    state = [tuple(s) for s in state]
    xs = jnp.moveaxis(x_local, 1, 0)

    def step(carry, x_t):
        new_carry = []
        inp = x_t
        for li, hc in enumerate(config.hidden_channels):
            k = config.kernel_sizes[li]
            cell = params["cells"][li]
            hprev, cprev = carry[li]
            gates = (
                sharded_conv2d(inp.astype(dt), cell["w_x"].astype(dt), pad=k // 2)
                + sharded_conv2d(hprev.astype(dt), cell["w_h"].astype(dt), pad=k // 2)
                + cell["b"]
            )
            hnew, cnew = gate_update(gates, cprev)
            new_carry.append((hnew, cnew))
            inp = hnew
        tap = None
        if collect_taps:
            # 1x1 head is purely local
            tap = conv2d(
                inp.astype(dt),
                params["head"]["w"].astype(dt),
                params["head"]["b"],
            ).astype(jnp.float32)
        return new_carry, tap

    final, taps = jax.lax.scan(step, state, xs)
    h_last = final[-1][0]
    pred = conv2d(
        h_last.astype(dt), params["head"]["w"].astype(dt), params["head"]["b"]
    ).astype(jnp.float32)
    return pred, taps, final


def _zero_state(config: ConvLSTMConfig, B: int, h: int, w: int):
    return [
        (_vary(jnp.zeros((B, h, w, hc), jnp.float32)),
         _vary(jnp.zeros((B, h, w, hc), jnp.float32)))
        for hc in config.hidden_channels
    ]


_STATE_SPEC_LEAF = P("dp", "lat", "lon", None)


def _state_specs(config: ConvLSTMConfig):
    return [(_STATE_SPEC_LEAF, _STATE_SPEC_LEAF) for _ in config.hidden_channels]


def convlstm_apply_sharded(
    params, x: jnp.ndarray, config: ConvLSTMConfig, mesh: Mesh
) -> jnp.ndarray:
    """Spatially sharded ConvLSTM forward: x (B, T, H, W, C) on the padded
    domain, sharded (dp, -, lat, lon, -); returns (B, H, W, 1) sharded
    (dp, lat, lon, -).  Bit-compatible with convlstm_apply."""

    def fn(params, x_local):
        B, _, h, w, _ = x_local.shape
        pred, _, _ = _local_convlstm_forward(
            params, x_local, _zero_state(config, B, h, w), config
        )
        return pred

    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P("dp", None, "lat", "lon", None)),
            out_specs=P("dp", "lat", "lon", None),
        )
    )(params, x)


def make_sharded_rollout_fn(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    mesh: Mesh,
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    unnormalize: bool = True,
):
    """State-carrying autoregressive rollout on the explicit-halo shard_map
    path — the hand-tuned serving kernel for BASELINE config #5 (decadal
    multi-tracer rollout with the grid sharded over the mesh).

    Same contract as rollout/autoregressive.make_rollout_fn:
    ``rollout(params, forcings, initial_state=None) -> (preds, state)`` with
    raw (B, T, C, H, W) forcings, (B, T, h, w) physical-unit predictions,
    and a per-layer (h, c) carry (sharded (dp, lat, lon, -)) for chunked
    continuation.  Normalization/padding run as plain GSPMD-sharded ops
    outside the shard_map; the scan itself is manual: one ring ppermute per
    axis per conv, carry resident shard-local for the whole chunk.
    """
    from nasa_niswan_tpu.data.dataset import zscore_static
    from nasa_niswan_tpu.rollout.autoregressive import _prep_frame

    static_z = None if static is None else zscore_static(static)
    H, W = padded_shape
    state_sharding = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        _state_specs(config),
        is_leaf=lambda s: isinstance(s, P),
    )

    body = jax.shard_map(
        lambda params, xs, state: _local_convlstm_forward(
            params, xs, state, config, collect_taps=True
        ),
        mesh=mesh,
        in_specs=(P(), P("dp", None, "lat", "lon", None), _state_specs(config)),
        out_specs=(
            P("dp", "lat", "lon", None),
            P(None, "dp", "lat", "lon", None),
            _state_specs(config),
        ),
    )

    @jax.jit
    def rollout(params, forcings, initial_state=None):
        B = forcings.shape[0]
        if initial_state is None:
            initial_state = [
                (jnp.zeros((B, H, W, hc), jnp.float32),
                 jnp.zeros((B, H, W, hc), jnp.float32))
                for hc in config.hidden_channels
            ]
        compute_dtype = jnp.dtype(config.compute_dtype)
        cast = compute_dtype if compute_dtype != jnp.float32 else None
        xs = _prep_frame(forcings, normalizer, static_z, padded_shape, cast)
        _, taps, state = body(params, xs, initial_state)
        preds = jnp.moveaxis(taps[..., 0], 0, 1)  # (B, T, H, W) padded
        preds = crop_to_grid(preds, grid_shape)
        if unnormalize:
            preds = normalizer.unnormalize_y(preds)
        return preds, state

    def rollout_with_placement(params, forcings, initial_state=None):
        forcings = jax.device_put(
            forcings, NamedSharding(mesh, P("dp", None, None, "lat", "lon"))
        )
        if initial_state is not None:
            initial_state = jax.device_put(
                [tuple(s) for s in initial_state], state_sharding
            )
        return rollout(params, forcings, initial_state)

    return rollout_with_placement
