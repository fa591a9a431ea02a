"""Training loop: jitted train/eval steps + epoch driver.

Re-designs train.py:23-145 for TPU:
  * ONE jitted ``train_step`` holds the whole per-batch pipeline —
    device-side normalization/padding (stats as XLA constants), forward,
    crop-to-grid, MSE+L1 loss (train.py:74-75,105), adam update, and batch
    R^2 — with buffer donation, so nothing round-trips to the host per batch
    (the reference syncs every batch for its sklearn r2 at train.py:114).
  * StepLR is applied by updating the injected lr hyperparameter once per
    epoch (train.py:72,120 semantics; see schedule.step_lr).
  * Epoch metrics accumulate as device scalars; a single host sync happens
    at the epoch print.
  * Checkpoints every ``checkpoint_every`` epochs in the reference's
    ``epoch-NNN`` layout (train.py:126-136), final ``logger.npy`` with the
    reference's 3-array format (train.py:138-142).

Data parallelism over a device mesh is layered on in parallel/dp.py; this
module is the single-device core it wraps.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
from nasa_niswan_tpu.data.dataset import Normalizer, zscore_static
from nasa_niswan_tpu.data.pipeline import async_batches, batch_iterator, device_prefetch
from nasa_niswan_tpu.evalx.metrics import r2
from nasa_niswan_tpu.models.registry import ModelBundle
from nasa_niswan_tpu.train.checkpoint import save_checkpoint
from nasa_niswan_tpu.train.schedule import step_lr


def make_optimizer(learning_rate: float, betas: Tuple[float, float]):
    """Adam with the reference's betas (train.py:71), lr injectable per epoch."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=learning_rate, b1=betas[0], b2=betas[1]
    )


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def _device_preprocess(
    x, y, normalizer: Normalizer, padded_shape, static: Optional[np.ndarray]
):
    """Raw (B,[T,]C,H,W) + (B,H,W) -> normalized padded NHWC + normalized y."""
    x_mean = jnp.asarray(normalizer.x_mean).reshape(-1, 1, 1)
    x_std = jnp.asarray(normalizer.x_std).reshape(-1, 1, 1)
    x = (x - x_mean) / x_std
    if static is not None:
        st = jnp.asarray(static)
        reps = x.shape[:-3] + st.shape
        x = jnp.concatenate([x, jnp.broadcast_to(st, reps)], axis=-3)
    if padded_shape is not None:
        x = pad_geo(x, padded_shape)
    x = jnp.moveaxis(x, -3, -1)
    y = (y - normalizer.y_mean) / normalizer.y_std
    return x, y


def _forward_cropped(bundle: ModelBundle, params, state, x, grid_shape, *, training, rng):
    pred, new_state = bundle.apply(params, state, x, training=training, rng=rng)
    pred = crop_to_grid(pred[..., 0], grid_shape)  # (B, H, W)
    return pred, new_state


def make_loss_fn(bundle: ModelBundle, grid_shape: Tuple[int, int]) -> Callable:
    """The training loss — MSE + L1 on the cropped grid (train.py:74-75,105)
    — as ``loss_fn(params, state, x, y, rng) -> (loss, (pred, new_state))``.
    ONE definition shared by the single-device/GSPMD step
    (build_train_step_fn) and the manual shard_map DP step (parallel/dp.py),
    so a loss change cannot silently break their pinned parity."""

    def loss_fn(params, state, x, y, rng):
        pred, new_state = _forward_cropped(
            bundle, params, state, x, grid_shape, training=True, rng=rng
        )
        loss = jnp.mean((y - pred) ** 2) + jnp.mean(jnp.abs(y - pred))
        return loss, (pred, new_state)

    return loss_fn


def build_train_step_fn(
    bundle: ModelBundle,
    normalizer: Normalizer,
    optimizer,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
) -> Callable:
    """Un-jitted (params, state, opt_state, x_raw, y_raw, rng) step body —
    jitted single-device by make_train_step, or pjit-ed over a mesh by
    parallel/dp.py and parallel/spatial.py."""
    static_z = None if static is None else zscore_static(static)
    loss_fn = make_loss_fn(bundle, grid_shape)

    def train_step(params, state, opt_state, x_raw, y_raw, rng):
        x, y = _device_preprocess(x_raw, y_raw, normalizer, padded_shape, static_z)
        (loss, (pred, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, x, y, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "r2": r2(y, pred)}
        return params, new_state, opt_state, metrics

    return train_step


def make_train_step(
    bundle: ModelBundle,
    normalizer: Normalizer,
    optimizer,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    donate: Optional[bool] = None,
) -> Callable:
    """Single-device jitted train step.

    donate=None auto-enables buffer donation of (params, opt_state) on
    accelerator backends — the updated pytrees reuse the old buffers,
    halving their HBM footprint.  Callers that re-use the pre-step params
    (e.g. parity tests) must pass donate=False.
    """
    if donate is None:
        donate = jax.default_backend() not in ("cpu",)
    return jax.jit(
        build_train_step_fn(
            bundle, normalizer, optimizer, padded_shape=padded_shape,
            grid_shape=grid_shape, static=static,
        ),
        donate_argnums=(0, 2) if donate else (),
    )


def build_eval_step_fn(
    bundle: ModelBundle,
    normalizer: Normalizer,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    unnormalize: bool = False,
) -> Callable:
    """Un-jitted eval step returning per-sample R^2 (val_loop parity: the
    reference evaluates bs=1 and averages per-sample scores, utils.py:52-75)
    plus predictions (normalized, or physical units when ``unnormalize``)."""
    static_z = None if static is None else zscore_static(static)

    def eval_step(params, state, x_raw, y_raw):
        x, y = _device_preprocess(x_raw, y_raw, normalizer, padded_shape, static_z)
        pred, _ = _forward_cropped(
            bundle, params, state, x, grid_shape, training=False, rng=None
        )
        flat_p = pred.reshape(pred.shape[0], -1)
        flat_y = y.reshape(y.shape[0], -1)
        ss_res = jnp.sum((flat_y - flat_p) ** 2, axis=1)
        ss_tot = jnp.sum(
            (flat_y - jnp.mean(flat_y, axis=1, keepdims=True)) ** 2, axis=1
        )
        per_sample_r2 = 1.0 - ss_res / ss_tot
        if unnormalize:
            pred = normalizer.unnormalize_y(pred)
        return per_sample_r2, pred

    return eval_step


def make_eval_step(
    bundle: ModelBundle,
    normalizer: Normalizer,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    unnormalize: bool = False,
) -> Callable:
    """Single-device jitted eval step."""
    return jax.jit(
        build_eval_step_fn(
            bundle, normalizer, padded_shape=padded_shape, grid_shape=grid_shape,
            static=static, unnormalize=unnormalize,
        )
    )


class DeviceWindowSource:
    """Device-resident sliding-window batches for sequence training.

    Host pipelines resend each frame ~seq_len times (windows overlap by
    seq_len-1), which makes canonical training ~99% input-bound through a
    slow host link (measured: input_wait_frac 0.986, bench.py --train).
    TPU-first fix: upload the split's CONTIGUOUS frame slab once
    (SequenceDataset.forcing_stream) and gather each batch's windows
    on-device by start index inside the jitted step — per batch only a
    (B,) int32 index vector crosses the host boundary.

    HBM cost: the raw slab, e.g. a full reference training year
    (17,520 x 5 x 90 x 144 f32) = 4.5 GB — resident once, no per-step copies
    beyond the (B, T, C, H, W) gather at HBM bandwidth.
    """

    def __init__(self, dataset, *, sharding=None):
        frames, targets = dataset.forcing_stream()
        self.seq_len = dataset.seq_len
        self.n = len(dataset)
        put = (lambda a: jax.device_put(a, sharding)) if sharding else jax.device_put
        self.frames = put(frames)  # (T_total, C, H, W)
        self.targets = put(targets)  # (N, H, W)

    def gather(
        self, frames: jnp.ndarray, targets: jnp.ndarray, starts: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B,) int32 window starts -> ((B, T, C, H, W), (B, H, W)).

        Trace-time building block for the jitted step.  ``frames``/
        ``targets`` MUST flow in as jit ARGUMENTS, not closure captures —
        jax lowering hashes captured constants at ~50 s/GB (a 3.3 GB slab
        costs minutes per compile); an argument is abstract and free.
        """
        x = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(
                frames, s, self.seq_len, axis=0
            )
        )(starts)
        y = targets[starts]
        return x, y


def make_device_train_step(
    bundle: ModelBundle,
    normalizer: Normalizer,
    optimizer,
    source: DeviceWindowSource,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    donate: Optional[bool] = None,
) -> Callable:
    """``step(params, state, opt_state, starts, rng)`` with the batch
    gathered from the device-resident slab inside the jit."""
    inner = build_train_step_fn(
        bundle, normalizer, optimizer, padded_shape=padded_shape,
        grid_shape=grid_shape, static=static,
    )

    def step(params, state, opt_state, frames, targets, starts, rng):
        x_raw, y_raw = source.gather(frames, targets, starts)
        return inner(params, state, opt_state, x_raw, y_raw, rng)

    if donate is None:
        donate = jax.default_backend() not in ("cpu",)
    jitted = jax.jit(step, donate_argnums=(0, 2) if donate else ())

    def call(params, state, opt_state, starts, rng):
        return jitted(
            params, state, opt_state, source.frames, source.targets, starts, rng
        )

    return call


def make_device_eval_step(
    bundle: ModelBundle,
    normalizer: Normalizer,
    source: DeviceWindowSource,
    *,
    padded_shape: Optional[Tuple[int, int]],
    grid_shape: Tuple[int, int] = (90, 144),
    static: Optional[np.ndarray] = None,
    unnormalize: bool = False,
) -> Callable:
    inner = build_eval_step_fn(
        bundle, normalizer, padded_shape=padded_shape, grid_shape=grid_shape,
        static=static, unnormalize=unnormalize,
    )

    def step(params, state, frames, targets, starts):
        x_raw, y_raw = source.gather(frames, targets, starts)
        return inner(params, state, x_raw, y_raw)

    jitted = jax.jit(step)

    def call(params, state, starts):
        return jitted(params, state, source.frames, source.targets, starts)

    return call


def fit(
    bundle: ModelBundle,
    train_dataset,
    val_dataset,
    config,
    *,
    normalizer: Optional[Normalizer] = None,
    static: Optional[np.ndarray] = None,
    init_params=None,
    init_state=None,
    init_opt_state=None,
    start_epoch: int = 1,
    verbose: bool = True,
    mesh=None,
    device_resident: Optional[bool] = None,
) -> Dict[str, Any]:
    """Epoch driver with reference logging/checkpoint parity.

    Returns {params, state, opt_state, logger} where logger holds the three
    reference metric arrays (MSELoss, r2_score, r2_score_val).

    device_resident=None auto-enables the DeviceWindowSource path (windows
    gathered on device from a resident frame slab; only indices cross the
    host link) for single-device sequence training when the slab fits —
    the measured host pipeline was 98.6% input-bound without it.  The
    guard budgets the slab only; at wide-channel scale the per-batch
    buffers (remat scan carries ~ B*T*H*W*sum(hidden)*8 bytes) compete for
    the same HBM — on RESOURCE_EXHAUSTED lower batch_size or pass
    device_resident=False.
    """
    since = time.time()
    normalizer = normalizer or train_dataset.normalizer
    rng = jax.random.PRNGKey(config.seed)
    padded = tuple(config.input_size) if config.input_size else None
    grid_shape = tuple(train_dataset[0][1].shape[-2:])  # physical (lat, lon)

    if init_params is None:
        rng, init_rng = jax.random.split(rng)
        params, state = bundle.init(init_rng)
    else:
        params, state = init_params, init_state

    optimizer = make_optimizer(config.learning_rate, tuple(config.betas))
    opt_state = init_opt_state if init_opt_state is not None else optimizer.init(params)

    if device_resident is None:
        slab_ok = (
            hasattr(train_dataset, "forcing_stream")
            and hasattr(val_dataset, "forcing_stream")
            and train_dataset[0][0].nbytes
            * (len(train_dataset) + train_dataset.seq_len)
            // train_dataset.seq_len
            < 6 * 1024**3
        )
        device_resident = mesh is None and slab_ok
    train_src = val_src = None
    if device_resident:
        if mesh is not None:
            raise ValueError("device_resident training is single-device/DP-free")
        train_src = DeviceWindowSource(train_dataset)
        val_src = DeviceWindowSource(val_dataset)
        batch_sharding = None
        train_step_d = make_device_train_step(
            bundle, normalizer, optimizer, train_src, padded_shape=padded,
            grid_shape=grid_shape, static=static,
        )
        eval_step_d = make_device_eval_step(
            bundle, normalizer, val_src, padded_shape=padded,
            grid_shape=grid_shape, static=static,
        )
    elif mesh is None:
        batch_sharding = None
        train_step = make_train_step(
            bundle, normalizer, optimizer, padded_shape=padded,
            grid_shape=grid_shape, static=static,
        )
        eval_step = make_eval_step(
            bundle, normalizer, padded_shape=padded, grid_shape=grid_shape,
            static=static,
        )
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nasa_niswan_tpu.parallel.dp import (
            make_dp_eval_step,
            make_dp_train_step,
            make_dp_train_step_shardmap,
        )

        batch_sharding = NamedSharding(mesh, P("dp"))
        # a pure-dp mesh with a stateless sequence model (the ConvLSTM
        # family) trains through the manual shard_map step so the fused
        # pallas2 kernels run per shard (GSPMD cannot partition a
        # pallas_call, and cell_impl="auto" there must resolve against the
        # PER-CHIP batch, not the global one); GSPMD-parity is pinned in
        # tests/test_parallel.py
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        pure_dp = all(
            n == 1 for a, n in sizes.items() if a != "dp"
        ) and "dp" in sizes
        stateless = not jax.tree.leaves(state)
        if pure_dp and stateless and bundle.family == "LSTM":
            train_step = make_dp_train_step_shardmap(
                bundle, normalizer, optimizer, mesh, padded_shape=padded,
                grid_shape=grid_shape, static=static,
            )
        else:
            train_step = make_dp_train_step(
                bundle, normalizer, optimizer, mesh, padded_shape=padded,
                grid_shape=grid_shape, static=static,
            )
        eval_step = make_dp_eval_step(
            bundle, normalizer, mesh, padded_shape=padded, grid_shape=grid_shape,
            static=static,
        )

    logger = {"MSELoss": [], "r2_score": [], "r2_score_val": []}
    step_size, gamma = config.scheduler_config

    # optional async orbax checkpoint backend (preemption coverage without
    # stalling the step loop); npz keeps the reference epoch-NNN layout
    orbax_ckpt = None
    if getattr(config, "checkpoint_backend", "npz") == "orbax":
        from nasa_niswan_tpu.train.checkpoint_orbax import AsyncCheckpointer

        orbax_ckpt = AsyncCheckpointer(
            os.path.join(config.snapshot_dir, "orbax"), max_to_keep=3
        )

    for epoch in range(start_epoch, config.num_epochs + 1):
        opt_state = set_learning_rate(
            opt_state, step_lr(config.learning_rate, step_size, gamma, epoch - 1)
        )
        losses, r2s = [], []
        if device_resident:
            order = np.arange(train_src.n)
            np.random.default_rng(
                np.uint32(config.seed) + np.uint32(epoch)
            ).shuffle(order)
            stop = train_src.n - (train_src.n % config.batch_size)
            for s in range(0, stop, config.batch_size):
                starts = jnp.asarray(order[s : s + config.batch_size], jnp.int32)
                rng, step_rng = jax.random.split(rng)
                params, state, opt_state, metrics = train_step_d(
                    params, state, opt_state, starts, step_rng
                )
                losses.append(metrics["loss"])
                r2s.append(metrics["r2"])
        else:
            batches = async_batches(
                train_dataset, config.batch_size, shuffle=True,
                seed=config.seed, epoch=epoch, sharding=batch_sharding,
            )
            for x_raw, y_raw in batches:
                rng, step_rng = jax.random.split(rng)
                params, state, opt_state, metrics = train_step(
                    params, state, opt_state, x_raw, y_raw, step_rng
                )
                losses.append(metrics["loss"])
                r2s.append(metrics["r2"])

        val_scores = []
        if device_resident:
            bs = config.batch_size
            for s in range(0, val_src.n, bs):
                idx = np.arange(s, min(s + bs, val_src.n))
                n_valid = len(idx)
                if n_valid < bs:  # pad to keep shapes static
                    idx = np.concatenate([idx, np.repeat(idx[-1:], bs - n_valid)])
                per_sample, _ = eval_step_d(
                    params, state, jnp.asarray(idx, jnp.int32)
                )
                val_scores.append(per_sample[:n_valid])
        else:
            # val keeps static shapes: a partial final batch is padded up to
            # batch_size (repeat-last) and only the valid per-sample scores
            # kept, so mesh-sharded validation covers the whole set (no
            # remainder drop)
            for x_raw, y_raw in async_batches(
                val_dataset, config.batch_size, shuffle=False, drop_last=False,
                to_device=False,
            ):
                n_valid = x_raw.shape[0]
                if n_valid < config.batch_size:
                    reps = config.batch_size - n_valid
                    x_raw = np.concatenate([x_raw, np.repeat(x_raw[-1:], reps, 0)])
                    y_raw = np.concatenate([y_raw, np.repeat(y_raw[-1:], reps, 0)])
                if batch_sharding is not None:
                    x_raw = jax.device_put(x_raw, batch_sharding)
                    y_raw = jax.device_put(y_raw, batch_sharding)
                per_sample, _ = eval_step(params, state, x_raw, y_raw)
                val_scores.append(per_sample[:n_valid])

        logger["MSELoss"].append(float(jnp.mean(jnp.stack(losses))))
        logger["r2_score"].append(float(jnp.mean(jnp.stack(r2s))))
        logger["r2_score_val"].append(float(jnp.mean(jnp.concatenate(val_scores))))
        if verbose:
            print(
                f"Epoch: {epoch}, Loss: {logger['MSELoss'][-1]:.5f}, "
                f"R2T: {logger['r2_score'][-1]:.5f}, "
                f"R2V: {logger['r2_score_val'][-1]:.5f}"
            )

        if config.checkpoint_every and epoch % config.checkpoint_every == 0:
            lr_now = step_lr(config.learning_rate, step_size, gamma, epoch - 1)
            if orbax_ckpt is not None:
                orbax_ckpt.save(
                    epoch, params, opt_state, learning_rate=lr_now,
                    model_state=state,
                )
            else:
                ckpt_dir = os.path.join(
                    config.snapshot_dir, f"epoch-{epoch:03d}"
                )
                save_checkpoint(
                    ckpt_dir, params, opt_state, learning_rate=lr_now,
                    epoch=epoch, model_state=state,
                )
            if verbose:
                print("Learning Rate:", [lr_now])

    if orbax_ckpt is not None:
        orbax_ckpt.close()  # drain in-flight async saves before returning

    # reference logger.npy: three consecutive np.save's in one file
    # (train.py:138-142)
    os.makedirs(config.snapshot_dir, exist_ok=True)
    with open(os.path.join(config.snapshot_dir, "logger.npy"), "wb") as f:
        np.save(f, np.array(logger["MSELoss"]))
        np.save(f, np.array(logger["r2_score"]))
        np.save(f, np.array(logger["r2_score_val"]))

    elapsed = time.time() - since
    if verbose:
        print(f"Training complete in {elapsed // 60:.0f}m {elapsed % 60:.0f}s")
    return {
        "params": params,
        "state": state,
        "opt_state": opt_state,
        "logger": logger,
        "elapsed_s": elapsed,
    }
