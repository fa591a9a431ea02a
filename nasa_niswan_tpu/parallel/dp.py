"""Data-parallel training over a device mesh (BASELINE config #4).

The idiomatic pjit form: the raw batch is sharded over the mesh's "dp" axis,
parameters/optimizer state are replicated, and jit-compiling the SAME step
body used single-device (train/loop.build_train_step_fn) makes XLA insert
the gradient allreduce (psum over ICI) automatically.  No collective code is
written by hand — the sharding annotations are the program.

Numerics are identical to single-device training on the same global batch
(verified in tests/test_parallel.py): per-batch mean loss/grads decompose
exactly across dp shards.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nasa_niswan_tpu.data.dataset import Normalizer
from nasa_niswan_tpu.models.registry import ModelBundle
from nasa_niswan_tpu.train.loop import (
    build_eval_step_fn,
    build_train_step_fn,
    fit,
)


def dp_shardings(mesh: Mesh, x_ndim: int):
    """(batch, replicated) NamedShardings for raw (B, ...) arrays."""
    batch = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return batch, rep


def make_dp_train_step(
    bundle: ModelBundle,
    normalizer: Normalizer,
    optimizer,
    mesh: Mesh,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
):
    fn = build_train_step_fn(
        bundle, normalizer, optimizer, padded_shape=padded_shape,
        grid_shape=grid_shape, static=static,
    )
    batch = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(rep, rep, rep, batch, batch, rep),
        out_shardings=(rep, rep, rep, rep),
    )


def make_dp_eval_step(
    bundle: ModelBundle,
    normalizer: Normalizer,
    mesh: Mesh,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
):
    fn = build_eval_step_fn(
        bundle, normalizer, padded_shape=padded_shape, grid_shape=grid_shape,
        static=static,
    )
    batch = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(rep, rep, batch, batch),
        out_shardings=(batch, batch),
    )


def fit_data_parallel(
    bundle: ModelBundle,
    train_dataset,
    val_dataset,
    config,
    *,
    static: Optional[np.ndarray] = None,
    init_params=None,
    init_state=None,
):
    """Epoch driver for DP training: builds a (dp,) mesh from
    config.dp_devices and runs train/loop.fit with mesh-aware steps."""
    from nasa_niswan_tpu.parallel.mesh import make_mesh

    if config.batch_size % config.dp_devices:
        raise ValueError("batch_size must be divisible by dp_devices")
    mesh = make_mesh(dp=config.dp_devices)
    return fit(
        bundle, train_dataset, val_dataset, config, static=static,
        init_params=init_params, init_state=init_state, mesh=mesh,
    )
