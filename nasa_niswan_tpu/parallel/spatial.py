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


def _local_convlstm_forward(params, x_local, config: ConvLSTMConfig):
    """shard_map body: ConvLSTM scan on a local (B, T, h, w, C) tile with
    explicit halo-exchange convs.  Mirrors models/convlstm.convlstm_apply
    (same gate math, zero-init carry) with sharded convs."""
    B, T, h, w, _ = x_local.shape
    # mark the zero carry as device-varying so scan's carry types line up
    # (shard_map varying-manual-axes typing)
    vary = lambda z: jax.lax.pvary(z, ("dp", "lat", "lon"))
    state = [
        (
            vary(jnp.zeros((B, h, w, hc), jnp.float32)),
            vary(jnp.zeros((B, h, w, hc), jnp.float32)),
        )
        for hc in config.hidden_channels
    ]
    xs = jnp.moveaxis(x_local, 1, 0)

    def step(carry, x_t):
        new_carry = []
        inp = x_t
        for li, hc in enumerate(config.hidden_channels):
            k = config.kernel_sizes[li]
            cell = params["cells"][li]
            hprev, cprev = carry[li]
            gates = (
                sharded_conv2d(inp, cell["w_x"], pad=k // 2)
                + sharded_conv2d(hprev, cell["w_h"], pad=k // 2)
                + cell["b"]
            )
            hnew, cnew = gate_update(gates, cprev)
            new_carry.append((hnew, cnew))
            inp = hnew
        return new_carry, None

    final, _ = jax.lax.scan(step, state, xs)
    h_last = final[-1][0]
    # 1x1 head is purely local
    return conv2d(h_last, params["head"]["w"], params["head"]["b"])


def convlstm_apply_sharded(
    params, x: jnp.ndarray, config: ConvLSTMConfig, mesh: Mesh
) -> jnp.ndarray:
    """Spatially sharded ConvLSTM forward: x (B, T, H, W, C) on the padded
    domain, sharded (dp, -, lat, lon, -); returns (B, H, W, 1) sharded
    (dp, lat, lon, -).  Bit-compatible with convlstm_apply."""
    fn = partial(_local_convlstm_forward, config=config)
    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P("dp", None, "lat", "lon", None)),
            out_specs=P("dp", "lat", "lon", None),
        )
    )(params, x)
