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

from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
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
    from nasa_niswan_tpu.parallel.dp import gspmd_safe_bundle

    bundle = gspmd_safe_bundle(bundle)
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


def _pallas2_cell_sharded(cell, inp, hprev, cprev, k: int, dt):
    """One fused-kernel cell step on a shard-LOCAL tile: the pallas2 kernel
    is opaque to GSPMD, but inside shard_map it only ever sees local data —
    so the conv halos become an explicit pre-exchange, and the kernel's
    zero-margin columns become HALO columns (verdict r2 item #3).

    Layout: exchange k//2 rows+cols of halo (ring ppermutes, zeros at the
    domain edge — exact SAME-pad semantics), lay the extended (h+2p, w+2p)
    tile into the padded-column layout at columns [p, p+w+2p), and run the
    kernel with w_valid = w+2p.  Valid outputs read inputs only from
    [o-p, o+w_valid+p) — all genuine tile/halo data — and the roll
    wraparound still lands in masked margin outputs, so the kernel is
    unchanged.  Crop the p halo ring off h'/c' afterward; the carry stays
    shard-local in the standard tile layout.
    """
    from nasa_niswan_tpu.ops.convlstm_pallas2 import (
        cell_step_pallas2,
        padded_cols,
    )
    from nasa_niswan_tpu.parallel.halo import halo_exchange_zero

    p = k // 2
    B, hl, wl = inp.shape[:3]
    if p == 0:
        # 1x1 conv: purely local, no halo, standard margin layout
        wp = padded_cols(wl, 0)
        x_l = jnp.pad(inp, ((0, 0), (0, 0), (0, wp - wl), (0, 0)))
        h_l = jnp.pad(hprev, ((0, 0), (0, 0), (0, wp - wl), (0, 0)))
        c_l = jnp.pad(cprev, ((0, 0), (0, 0), (0, wp - wl), (0, 0)))
        h2, c2 = cell_step_pallas2(cell, x_l, h_l, c_l, k, dt, 0, wl)
        return h2[:, :, :wl, :], c2[:, :, :wl, :]

    o = p
    w_ext = wl + 2 * p
    wp = padded_cols(w_ext, o)  # right margin >= p by construction

    def lay(t):  # (B, hl+2p, wl+2p, C) -> margin layout
        return jnp.pad(t, ((0, 0), (0, 0), (o, wp - o - w_ext), (0, 0)))

    x_l = lay(halo_exchange_zero(inp, p))
    h_l = lay(halo_exchange_zero(hprev, p))
    # c is elementwise: only the kept output positions matter; align its
    # valid block with the tile's true columns, zeros elsewhere
    c_l = jnp.pad(
        cprev, ((0, 0), (p, p), (o + p, wp - o - p - wl), (0, 0))
    )
    h2, c2 = cell_step_pallas2(cell, x_l, h_l, c_l, k, dt, o, w_ext)
    return (
        h2[:, p : p + hl, o + p : o + p + wl, :],
        c2[:, p : p + hl, o + p : o + p + wl, :],
    )


def _cells_step(params, inp, carry, config: ConvLSTMConfig, dt):
    """One timestep through the stacked cells on a shard-LOCAL tile with
    explicit halo-exchange convs: the per-layer loop shared by the open-loop
    scan body (_local_convlstm_forward) and the closed-loop feedback scan
    (make_sharded_feedback_rollout).  Returns (new_carry, h_last)."""
    fused = config.cell_impl == "pallas2"
    new_carry = []
    for li in range(len(config.hidden_channels)):
        k = config.kernel_sizes[li]
        cell = params["cells"][li]
        hprev, cprev = carry[li]
        if fused:
            hnew, cnew = _pallas2_cell_sharded(cell, inp, hprev, cprev, k, dt)
        else:
            gates = (
                sharded_conv2d(
                    inp.astype(dt), cell["w_x"].astype(dt), pad=k // 2
                )
                + sharded_conv2d(
                    hprev.astype(dt), cell["w_h"].astype(dt), pad=k // 2
                )
                + cell["b"]
            )
            hnew, cnew = gate_update(gates, cprev)
        new_carry.append((hnew, cnew))
        inp = hnew
    return new_carry, inp


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

    ``config.cell_impl == 'pallas2'`` routes each cell through the fused
    TPU kernel on the local tile (halos pre-exchanged, margins repurposed
    as halo columns — see _pallas2_cell_sharded); any other impl uses the
    XLA sharded convs.  Both are bit-compatible with the single-device
    model.

    Returns (pred_last (B,h,w,1), taps (T,B,h,w,1) or None, final state).
    """
    dt = jnp.dtype(compute_dtype or config.compute_dtype)
    state = [tuple(s) for s in state]
    # tuple inputs (shared met, per-species emission — the multitracer
    # de-duplication): scan over the parts and concat per STEP, so the
    # full-T concatenated tensor is never materialized per species
    parts = x_local if isinstance(x_local, tuple) else (x_local,)
    xs = tuple(jnp.moveaxis(p, 1, 0) for p in parts)

    def step(carry, x_t):
        inp = x_t[0] if len(x_t) == 1 else jnp.concatenate(x_t, axis=-1)
        new_carry, inp = _cells_step(params, inp, carry, config, dt)
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


def _resolve_sharded_impl(
    config: ConvLSTMConfig, cell_impl: Optional[str]
) -> ConvLSTMConfig:
    """Serving-cell policy for the shard_map paths: 'auto' means the fused
    pallas2 kernel on TPU (shard-local tiles are exactly where it wins —
    small per-shard batch, explicit halos already exchanged), XLA on CPU."""
    impl = cell_impl if cell_impl is not None else config.cell_impl
    if impl == "auto":
        impl = "pallas2" if jax.default_backend() == "tpu" else "xla"
    if impl != config.cell_impl:
        import dataclasses

        config = dataclasses.replace(config, cell_impl=impl)
    return config


def _make_scan_body(config: ConvLSTMConfig, mesh: Mesh, *, n_inputs: int = 1):
    """The explicit-halo shard_map scan with per-step taps, shared by the
    single-tracer and both multitracer rollout builders.  ``n_inputs`` > 1
    passes that many sharded (B, T, h, w, C_i) frame tensors, concatenated
    per step inside the body (the shared-met de-duplication)."""
    frame_spec = P("dp", None, "lat", "lon", None)

    def fn(params, *args):
        *xs_parts, state = args
        x = xs_parts[0] if n_inputs == 1 else tuple(xs_parts)
        return _local_convlstm_forward(
            params, x, state, config, collect_taps=True
        )

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), *([frame_spec] * n_inputs), _state_specs(config)),
        out_specs=(
            P("dp", "lat", "lon", None),
            P(None, "dp", "lat", "lon", None),
            _state_specs(config),
        ),
        # interpret-mode pallas_call doesn't thread varying-manual-axes
        # through its internal dynamic_slices; disable the vma typecheck
        # for the fused-kernel path (JAX's documented workaround) — the
        # XLA path keeps full checking
        check_vma=config.cell_impl != "pallas2",
    )


def _zero_rollout_state(config: ConvLSTMConfig, B: int, H: int, W: int):
    return [
        (jnp.zeros((B, H, W, hc), jnp.float32),
         jnp.zeros((B, H, W, hc), jnp.float32))
        for hc in config.hidden_channels
    ]


def make_sharded_rollout_fn(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    mesh: Mesh,
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    unnormalize: bool = True,
    cell_impl: Optional[str] = None,
):
    """State-carrying autoregressive rollout on the explicit-halo shard_map
    path — the hand-tuned serving kernel for BASELINE config #5 (decadal
    multi-tracer rollout with the grid sharded over the mesh).

    ``cell_impl`` overrides ``config.cell_impl`` for the sharded scan;
    "pallas2" runs the fused TPU kernel on each local tile with explicit
    halo exchange (bit-compatible with the XLA sharded path — verified in
    tests/test_parallel.py).

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

    config = _resolve_sharded_impl(config, cell_impl)
    static_z = None if static is None else zscore_static(static)
    H, W = padded_shape
    state_sharding = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        _state_specs(config),
        is_leaf=lambda s: isinstance(s, P),
    )

    body = _make_scan_body(config, mesh)

    @jax.jit
    def rollout(params, forcings, initial_state=None):
        B = forcings.shape[0]
        if initial_state is None:
            initial_state = _zero_rollout_state(config, B, H, W)
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


def make_sharded_multitracer_rollout(
    config: ConvLSTMConfig,
    normalizers,
    mesh: Mesh,
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    cell_impl: Optional[str] = None,
):
    """BASELINE config #5 verbatim: S per-species emulators served in ONE
    compiled program with the global grid sharded over the mesh.

    Composes the explicit-halo sharded scan (make_sharded_rollout_fn's
    body — fused pallas2 cells on local tiles on TPU) with the
    multitracer trace-time species unroll (rollout/multitracer.py: never
    vmap over parameters — vmapped conv filters lower as ~6x-slower
    grouped convs).  S shard_map scans live in one jitted program; XLA
    schedules them back to back on the same mesh.

    Contract mirrors rollout/multitracer.make_multitracer_rollout:
    ``rollout(stacked_params, forcings, state=None)`` with forcings
    (S, B, T, C, H, W) raw, returning ((S, B, T, h, w) physical-unit
    predictions, stacked (S, ...) carry) for chunked decadal
    continuation; the carry stays sharded (dp, lat, lon) on device.
    """
    from nasa_niswan_tpu.rollout.autoregressive import _prep_frame
    from nasa_niswan_tpu.rollout.multitracer import _split_state, _stack_states

    config = _resolve_sharded_impl(config, cell_impl)
    H, W = padded_shape
    S = len(normalizers)
    norms = [
        (
            jnp.asarray(n.x_mean, jnp.float32),
            jnp.asarray(n.x_std, jnp.float32),
            jnp.float32(n.y_mean),
            jnp.float32(n.y_std),
        )
        for n in normalizers
    ]

    body = _make_scan_body(config, mesh)
    # the stacked (S, B, H, W, hc) carry: species axis replicated, grid
    # axes on the mesh
    stacked_state_sharding = [
        (NamedSharding(mesh, P(None, "dp", "lat", "lon", None)),) * 2
        for _ in config.hidden_channels
    ]

    compute_dtype = jnp.dtype(config.compute_dtype)
    cast = compute_dtype if compute_dtype != jnp.float32 else None

    @jax.jit
    def rollout(stacked_params, forcings, state=None):
        B = forcings.shape[1]
        preds_out, states_out = [], []
        for s in range(S):  # trace-time unroll, one program
            params_s = jax.tree.map(lambda a: a[s], stacked_params)
            st = _split_state(state, s)
            if st is None:
                st = _zero_rollout_state(config, B, H, W)
            x_mean, x_std, y_mean, y_std = norms[s]
            norm_s = Normalizer(x_mean, x_std, y_mean, y_std)
            xs = _prep_frame(forcings[s], norm_s, None, padded_shape, cast)
            _, taps, st2 = body(params_s, xs, st)
            preds = jnp.moveaxis(taps[..., 0], 0, 1)  # (B, T, H, W)
            preds = crop_to_grid(preds, grid_shape) * y_std + y_mean
            preds_out.append(preds)
            states_out.append(st2)
        return jnp.stack(preds_out), _stack_states(states_out)

    def rollout_with_placement(stacked_params, forcings, state=None):
        forcings = jax.device_put(
            forcings,
            NamedSharding(mesh, P(None, "dp", None, None, "lat", "lon")),
        )
        if state is not None:
            # a host-restored stacked carry gets mesh placement up front
            # (like make_sharded_rollout_fn), not a per-chunk reshard
            state = jax.device_put(
                [tuple(s) for s in state], stacked_state_sharding
            )
        return rollout(stacked_params, forcings, state)

    return rollout_with_placement


def make_sharded_multitracer_rollout_shared(
    config: ConvLSTMConfig,
    normalizers,
    mesh: Mesh,
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    cell_impl: Optional[str] = None,
):
    """Sharded multitracer with DE-DUPLICATED forcings — the production
    shape of config #5 (what scripts/run_decadal_rollout.py serves):

        met:       (B, T, C-1, H, W)  shared u/v/omega/prec[, levels]
        emissions: (S, B, T, H, W)    per-species source fields

    The shared meteorology is normalized/padded ONCE and every species'
    sharded scan consumes the same device tensor; each scan step concats
    the species' emission channel per STEP inside the shard_map body
    (never a full-T per-species copy).  HBM per added species = emission
    stream + carry, like rollout/multitracer.make_multitracer_rollout_
    shared, but with the grid sharded over the mesh and the fused pallas2
    cells on local tiles on TPU.

    Returns ``rollout(stacked_params, met, emissions, state=None) ->
    ((S, B, T, h, w) physical-unit predictions, stacked carry)``.
    """
    config = _resolve_sharded_impl(config, cell_impl)
    H, W = padded_shape
    S = len(normalizers)
    met_mean = jnp.asarray(normalizers[0].x_mean[:-1], jnp.float32)
    met_std = jnp.asarray(normalizers[0].x_std[:-1], jnp.float32)
    emis_stats = [
        (
            jnp.float32(n.x_mean[-1]),
            jnp.float32(n.x_std[-1]),
            jnp.float32(n.y_mean),
            jnp.float32(n.y_std),
        )
        for n in normalizers
    ]

    body = _make_scan_body(config, mesh, n_inputs=2)
    stacked_state_sharding = [
        (NamedSharding(mesh, P(None, "dp", "lat", "lon", None)),) * 2
        for _ in config.hidden_channels
    ]

    compute_dtype = jnp.dtype(config.compute_dtype)

    @jax.jit
    def rollout(stacked_params, met, emissions, state=None):
        from nasa_niswan_tpu.rollout.multitracer import (
            _split_state,
            _stack_states,
        )

        B = emissions.shape[1]
        m = (met - met_mean.reshape(-1, 1, 1)) / met_std.reshape(-1, 1, 1)
        m = m.astype(compute_dtype)
        met_xs = jnp.moveaxis(pad_geo(m, padded_shape), -3, -1)
        preds_out, states_out = [], []
        for s in range(S):  # trace-time unroll; met_xs shared by all scans
            params_s = jax.tree.map(lambda a: a[s], stacked_params)
            st = _split_state(state, s)
            if st is None:
                st = _zero_rollout_state(config, B, H, W)
            e_mean, e_std, y_mean, y_std = emis_stats[s]
            e = ((emissions[s] - e_mean) / e_std).astype(compute_dtype)
            e_xs = pad_geo(e, padded_shape)[..., None]  # (B, T, H, W, 1)
            _, taps, st2 = body(params_s, met_xs, e_xs, st)
            preds = jnp.moveaxis(taps[..., 0], 0, 1)
            preds = crop_to_grid(preds, grid_shape) * y_std + y_mean
            preds_out.append(preds)
            states_out.append(st2)
        return jnp.stack(preds_out), _stack_states(states_out)

    def rollout_with_placement(stacked_params, met, emissions, state=None):
        met = jax.device_put(
            met, NamedSharding(mesh, P("dp", None, None, "lat", "lon"))
        )
        emissions = jax.device_put(
            emissions,
            NamedSharding(mesh, P(None, "dp", None, "lat", "lon")),
        )
        if state is not None:
            state = jax.device_put(
                [tuple(s) for s in state], stacked_state_sharding
            )
        return rollout(stacked_params, met, emissions, state)

    return rollout_with_placement


def make_sharded_feedback_rollout(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    mesh: Mesh,
    *,
    padded_shape: Tuple[int, int] = (100, 154),
    grid_shape: Tuple[int, int] = (90, 144),
    cell_impl: Optional[str] = None,
):
    """CLOSED-LOOP (seq2seq feedback) serving with the grid sharded over the
    mesh — the production deployment mode of config #3 (test.ipynb cell 8's
    ``X[:, -1] = pred`` run continuously), scaled out spatially.

    Same contract as evalx.evaluate.make_closed_loop_chunk and bit-compatible
    with it: ``run_chunk(params, state, prev_norm, x_chunk) -> (state,
    prev_norm, preds)`` with x_chunk raw (Tc, C-1, h, w) meteorology,
    prev_norm (1, h, w) the previous NORMALIZED prediction, preds (Tc, h, w)
    physical units.  The returned state is mesh-sharded for chunked
    continuation; prev_norm comes back in the standard host layout.

    The sequential data dependency of the feedback channel (step t+1's input
    contains step t's prediction) needs the step-t prediction in the
    pad_geo layout (cyclic lon wrap + reflective lat mirror of the GLOBAL
    valid grid) on every tile.  The prediction frame is tiny (one channel,
    ~60 KB f32 at 100x154), so the rebuild is an all_gather of the tap tiles
    inside the scan — two ICI collectives per step moving less data than one
    conv halo — followed by the exact same crop + pad_geo ops the
    single-device closed loop applies (bit-parity by construction) and a
    local re-slice.  The conv halos stay the ring-ppermute exchanges of the
    open-loop sharded scan; on TPU the cells run the fused pallas2 kernel on
    local tiles (cell_impl="auto").
    """
    config = _resolve_sharded_impl(config, cell_impl)
    H, W = padded_shape
    norm = normalizer
    x_mean = jnp.asarray(norm.x_mean).reshape(-1, 1, 1)
    x_std = jnp.asarray(norm.x_std).reshape(-1, 1, 1)
    dt = jnp.dtype(config.compute_dtype)
    tile_spec = P(None, "lat", "lon", None)
    state_specs = [(tile_spec, tile_spec) for _ in config.hidden_channels]
    state_sharding = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        state_specs,
        is_leaf=lambda s: isinstance(s, P),
    )

    def body(params, xs_local, state, fb0_local):
        # xs_local (Tc, hl, wl, C-1) local tile of the padded domain;
        # fb0_local (1, hl, wl, 1) local tile of the padded feedback frame
        hl, wl = xs_local.shape[1], xs_local.shape[2]
        i_lat = jax.lax.axis_index("lat")
        i_lon = jax.lax.axis_index("lon")
        state = [tuple(s) for s in state]

        def rebuild_fb(pred_local):
            # (1, hl, wl, 1) normalized padded-domain tap -> next step's
            # local feedback tile, via the global pad_geo re-map
            g = jax.lax.all_gather(pred_local, "lat", axis=1, tiled=True)
            g = jax.lax.all_gather(g, "lon", axis=2, tiled=True)
            valid = crop_to_grid(g[..., 0], grid_shape)  # (1, h, w)
            fb = pad_geo(valid, padded_shape)[..., None]  # (1, H, W, 1)
            fb = jax.lax.dynamic_slice_in_dim(fb, i_lat * hl, hl, axis=1)
            return jax.lax.dynamic_slice_in_dim(fb, i_lon * wl, wl, axis=2)

        def step(carry, x_t):
            st, fb = carry
            inp = jnp.concatenate([x_t[None], fb], axis=-1)  # (1,hl,wl,C)
            new_st, h_last = _cells_step(params, inp, st, config, dt)
            pred = conv2d(
                h_last.astype(dt),
                params["head"]["w"].astype(dt),
                params["head"]["b"],
            ).astype(jnp.float32)
            # the LAST step's rebuild is discarded with the final fb carry —
            # a uniform scan body cannot skip it, and restructuring (carrying
            # the pred tile or the global valid frame instead) just relocates
            # the one redundant rebuild; cost is 2 gathers of a ~60 KB frame
            # per chunk, noise next to the T conv halos
            return (new_st, rebuild_fb(pred)), pred[..., 0]  # (1, hl, wl)

        (state, _), taps = jax.lax.scan(step, (state, fb0_local), xs_local)
        return state, taps  # taps (Tc, 1, hl, wl)

    body_sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, "lat", "lon", None),
            state_specs,
            tile_spec,
        ),
        out_specs=(state_specs, P(None, None, "lat", "lon")),
        check_vma=config.cell_impl != "pallas2",
    )

    @jax.jit
    def run_chunk(params, state, prev_norm, x_chunk):
        xn = (x_chunk - x_mean) / x_std  # (Tc, C-1, h, w)
        xs = jnp.moveaxis(pad_geo(xn, padded_shape), 1, -1)  # (Tc, H, W, C-1)
        fb0 = pad_geo(prev_norm, padded_shape)[..., None]  # (1, H, W, 1)
        state, taps = body_sm(params, xs, state, fb0)
        preds_norm = crop_to_grid(taps, grid_shape)  # (Tc, 1, h, w)
        return state, preds_norm[-1], norm.unnormalize_y(preds_norm[:, 0])

    def run_with_placement(params, state, prev_norm, x_chunk):
        state = jax.device_put([tuple(s) for s in state], state_sharding)
        return run_chunk(params, state, prev_norm, x_chunk)

    return run_with_placement
