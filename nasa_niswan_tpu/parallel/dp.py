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


def gspmd_safe_bundle(bundle: ModelBundle, *, force: bool = False) -> ModelBundle:
    """Resolve the bundle to an implementation GSPMD can partition.

    A ``pallas_call`` is opaque to the SPMD partitioner, so a pjit/GSPMD
    step must never trace the fused Pallas cell: ``cell_impl="auto"``
    (which would otherwise resolve per traced batch, picking pallas2 at
    B<=4 on TPU) is pinned to the XLA cell here.  An explicitly forced
    Pallas impl is rejected loudly — use the manual shard_map paths
    (make_dp_train_step_shardmap, make_sharded_rollout_fn) for those —
    unless ``force`` (the eval path, where the XLA cell is numerically
    equivalent and the caller composes train=shard_map with eval=GSPMD).
    """
    impl = getattr(bundle.config, "cell_impl", None)
    if impl is None:
        return bundle
    if impl == "auto" or (force and impl.startswith("pallas")):
        if bundle.rebuild is None:
            raise ValueError(
                f"cell_impl={impl!r} needs a rebuild hook to swap in the "
                "XLA cell for the GSPMD step, but this ModelBundle has "
                "none — construct it via build_model, or pass "
                "cell_impl='xla' up front"
            )
        return bundle.rebuild(cell_impl="xla")
    if impl.startswith("pallas"):
        raise ValueError(
            f"cell_impl={impl!r} cannot run under a GSPMD step (pallas_call "
            "is opaque to the partitioner); pass cell_impl='xla' or use the "
            "manual shard_map paths (make_dp_train_step_shardmap, "
            "make_sharded_rollout_fn)"
        )
    return bundle


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
        gspmd_safe_bundle(bundle), normalizer, optimizer,
        padded_shape=padded_shape, grid_shape=grid_shape, static=static,
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
        gspmd_safe_bundle(bundle, force=True), normalizer,
        padded_shape=padded_shape, grid_shape=grid_shape, static=static,
    )
    batch = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(rep, rep, batch, batch),
        out_shardings=(batch, batch),
    )


def make_dp_train_step_shardmap(
    bundle: ModelBundle,
    normalizer: Normalizer,
    optimizer,
    mesh: Mesh,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
):
    """Manual shard_map DP step — the path that lets multi-chip training use
    the fused Pallas kernels.

    GSPMD treats a ``pallas_call`` as opaque, so under ``make_dp_train_step``
    the fused pallas2 cell (and its fused BPTT backward) cannot run sharded;
    the traced batch is also the GLOBAL batch, so ``cell_impl="auto"``
    resolves against B_global even though each chip only holds B/n_dp.
    Here each device runs the per-shard forward/backward on its LOCAL batch
    (auto resolves per-chip — e.g. global B=8 over dp=8 is per-chip B=1, the
    fused kernels' best case), gradients and the loss are ``pmean``-reduced
    over "dp" (exact: the global-batch mean decomposes across equal shards),
    R² is rebuilt from psum'd sufficient statistics (its global form does
    NOT decompose as a mean of shard R²s), and the replicated optimizer
    update runs identically on every device.

    Numerics match ``make_dp_train_step`` to f32 reduction-order tolerance
    (tests/test_parallel.py).
    """
    import jax.numpy as jnp
    import optax

    from nasa_niswan_tpu.data.dataset import zscore_static
    from nasa_niswan_tpu.train.loop import _device_preprocess, make_loss_fn

    static_z = None if static is None else zscore_static(static)
    loss_fn = make_loss_fn(bundle, grid_shape)

    def shard_body(params, state, opt_state, x_raw, y_raw, rng):
        x, y = _device_preprocess(x_raw, y_raw, normalizer, padded_shape,
                                  static_z)
        # decorrelate per-shard randomness (dropout etc.); rng-free models
        # (the ConvLSTM family) are unaffected
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        (loss, (pred, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, x, y, rng)
        # check_vma=False (below) selects shard_map's classic manual
        # semantics: autodiff returns the shard-LOCAL gradient for every
        # path (plain autodiff AND the fused-BPTT custom VJP alike), and
        # the global-batch mean gradient is the explicit pmean — the
        # classic DP allreduce.  (Under check_vma=True the two paths
        # disagree: plain autodiff implicitly psums cotangents of
        # replicated params, a custom VJP does not.)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        # global-batch R² from psum'd sufficient statistics (sklearn
        # semantics on the concatenated batch, matching the GSPMD step)
        yf, pf = jnp.ravel(y), jnp.ravel(pred)
        n = jax.lax.psum(jnp.float32(yf.size), "dp")
        s_y = jax.lax.psum(jnp.sum(yf), "dp")
        s_y2 = jax.lax.psum(jnp.sum(yf * yf), "dp")
        ss_res = jax.lax.psum(jnp.sum((yf - pf) ** 2), "dp")
        ss_tot = s_y2 - s_y * s_y / n
        r2v = 1.0 - ss_res / ss_tot
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, {"loss": loss, "r2": r2v}

    rep, batch = P(), P("dp")
    # check_vma=False for the same reason as the sharded pallas2 rollout
    # (parallel/spatial.py): interpret-mode pallas_call block indexing
    # mixes varying operands with unvarying grid indices, which the vma
    # checker rejects; numerics are pinned by the GSPMD-parity tests.
    jitted = jax.jit(
        jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(rep, rep, rep, batch, batch, rep),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        )
    )

    def step(params, state, opt_state, x_raw, y_raw, rng):
        # With check_vma=False the replication check cannot catch it, so
        # guard loudly: a stateful model's state (UNet BN running stats)
        # would be computed per shard and silently returned as device-0's.
        if jax.tree.leaves(state):
            raise ValueError(
                "make_dp_train_step_shardmap supports stateless models only "
                "(per-shard model state would silently diverge); use "
                "make_dp_train_step for stateful families"
            )
        return jitted(params, state, opt_state, x_raw, y_raw, rng)

    return step


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
    mesh = make_mesh(
        dp=config.dp_devices, devices=jax.devices()[: config.dp_devices]
    )
    return fit(
        bundle, train_dataset, val_dataset, config, static=static,
        init_params=init_params, init_state=init_state, mesh=mesh,
    )
