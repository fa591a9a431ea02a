"""Multi-step seq2seq training with teacher forcing / scheduled sampling
(BASELINE config #3).

Single-step training (train/loop.py) only ever shows the model ground-truth
history; a closed-loop emulator must survive its *own* predictions.  Here
the training step runs the model autoregressively over a T-step chunk: the
6th input channel (the previous-step concentration, the reference's X6
feedback channel, dataset.py:330 / test.ipynb cell 8) is, per step, either
the ground truth (teacher forcing) or the model's previous prediction,
chosen by a Bernoulli draw with probability ``teacher_prob`` — annealed
over training (scheduled sampling, Bengio et al. 2015) so the model
gradually weans off ground truth.  Loss is the step-averaged MSE+L1 over
the whole chunk; gradients flow through the feedback path (full BPTT via
the scan).

Everything (normalization, padding, the per-step Bernoulli draws, the
feedback substitution) lives inside one jitted scan.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
from nasa_niswan_tpu.data.dataset import Normalizer
from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_apply


def inverse_sigmoid_schedule(epoch: int, k: float = 10.0) -> float:
    """Teacher-forcing probability k/(k+exp(epoch/k)): starts near 1,
    anneals toward 0 (the classic scheduled-sampling decay)."""
    return k / (k + math.exp(epoch / k))


def _r2_from_stats(stats):
    """Global R^2 from sufficient statistics ``(ss_res, s_y, s_y2, n)`` —
    the decomposable form (sklearn semantics on the concatenated chunk):
    unlike a mean of per-shard R^2s, these stats psum exactly across a
    data-parallel mesh (same construction as parallel/dp.py)."""
    ss_res, s_y, s_y2, n = stats
    ss_tot = s_y2 - s_y * s_y / n
    return 1.0 - ss_res / ss_tot


def _gspmd_safe_seq2seq_config(config: ConvLSTMConfig) -> ConvLSTMConfig:
    """A ``pallas_call`` is opaque to the SPMD partitioner, so the GSPMD
    seq2seq step pins ``cell_impl='auto'`` to the XLA cell and rejects an
    explicitly forced Pallas impl (use make_seq2seq_train_step_shardmap for
    those) — the seq2seq mirror of parallel/dp.gspmd_safe_bundle."""
    import dataclasses

    impl = config.cell_impl
    if impl == "auto":
        return dataclasses.replace(config, cell_impl="xla")
    if impl.startswith("pallas"):
        raise ValueError(
            f"cell_impl={impl!r} cannot run under the GSPMD seq2seq step "
            "(pallas_call is opaque to the partitioner); pass "
            "cell_impl='xla' or use make_seq2seq_train_step_shardmap"
        )
    return config


def make_seq2seq_train_step(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    optimizer,
    *,
    padded_shape: Tuple[int, int],
    grid_shape: Tuple[int, int],
    mesh=None,
    external_draws: bool = False,
):
    """Returns jitted ``step(params, opt_state, x, prev0, y, rng,
    teacher_prob) -> (params, opt_state, metrics)``.

    ``external_draws=True`` swaps the ``rng`` argument for a precomputed
    (T, B) Bernoulli matrix — the seam that lets an external replica (the
    torch trajectory-parity oracle, tests/test_train_parity.py) consume
    the SAME scheduled-sampling choices step for step.

    x: raw (B, T, C-1, H, W) forcings (5 surface channels, or the fused
    3*levels+2 stack of config #2); prev0: raw (B, H, W) concentration at
    t-1 of the chunk start; y: raw (B, T, H, W) target series.  The model's
    ``config.in_channels`` is the forcing count + 1 (the feedback channel —
    6 in the reference's surface mode, dataset.py:330).

    With ``mesh`` (a (dp,) jax.sharding.Mesh) the step runs data-parallel
    under GSPMD: the batch axis of (x, prev0, y) is sharded over "dp",
    params/opt_state replicated, and XLA inserts the gradient allreduce —
    the per-step Bernoulli draws and the feedback substitution are
    batch-local, so no new collectives appear (BASELINE configs #3 x #4).
    """
    if mesh is not None:
        config = _gspmd_safe_seq2seq_config(config)
    forward_chunk = _make_forward_chunk(
        config, normalizer, padded_shape=padded_shape,
        grid_shape=grid_shape, auto_mode="train",
        external_draws=external_draws,
    )

    def train_step(params, opt_state, x, prev0, y, rng, teacher_prob):
        (loss, stats), grads = jax.value_and_grad(
            lambda p: forward_chunk(p, x, prev0, y, rng, teacher_prob),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "r2": _r2_from_stats(stats)}

    if mesh is None:
        return jax.jit(train_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(rep, rep, batch, batch, batch, rep, rep),
        out_shardings=(rep, rep, rep),
    )


def make_seq2seq_train_step_shardmap(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    optimizer,
    *,
    padded_shape: Tuple[int, int],
    grid_shape: Tuple[int, int],
    mesh,
):
    """Manual shard_map DP seq2seq step — the path that lets multi-chip
    scheduled-sampling training run the fused Pallas kernels (fwd + the
    whole-chunk fused BPTT backward) on each shard's LOCAL batch, exactly
    like parallel/dp.make_dp_train_step_shardmap for windowed training.

    Bit-parity with the single-device step: the scheduled-sampling draws
    are computed GLOBALLY (same rng -> same (T, B_global) Bernoulli matrix
    as single-device) inside the jit and sharded along the batch column, so
    every sample sees the same teacher/feedback choice it would see
    single-device; gradients/loss pmean over "dp" (exact for equal shards),
    R^2 rebuilt from psum'd sufficient statistics.
    """
    from jax.sharding import PartitionSpec as P

    forward_chunk = _make_forward_chunk(
        config, normalizer, padded_shape=padded_shape,
        grid_shape=grid_shape, auto_mode="train", external_draws=True,
    )

    def shard_body(params, opt_state, x, prev0, y, draws, teacher_prob):
        (loss, stats), grads = jax.value_and_grad(
            lambda p: forward_chunk(p, x, prev0, y, draws, teacher_prob),
            has_aux=True,
        )(params)
        # check_vma=False manual semantics: autodiff returns shard-LOCAL
        # grads on every path (plain autodiff AND the fused-BPTT custom
        # VJP); the global-batch mean gradient is the explicit pmean
        # (see parallel/dp.py for the full rationale)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        stats = jax.lax.psum(stats, "dp")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "r2": _r2_from_stats(stats)}

    rep, batch = P(), P("dp")
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(rep, rep, batch, batch, batch, P(None, "dp"), rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )

    def step(params, opt_state, x, prev0, y, rng, teacher_prob):
        B, T = x.shape[:2]
        draws = jax.random.bernoulli(rng, teacher_prob, (T, B))
        return sharded(params, opt_state, x, prev0, y, draws, teacher_prob)

    return jax.jit(step)


def make_seq2seq_eval_step(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    *,
    padded_shape: Tuple[int, int],
    grid_shape: Tuple[int, int],
):
    """Jitted closed-loop evaluation: the whole chunk runs on the model's
    OWN feedback (teacher_prob = 0) — the deployment condition.  Returns
    ``eval_step(params, x, prev0, y) -> (loss, r2)``."""
    forward_chunk = _make_forward_chunk(
        config, normalizer, padded_shape=padded_shape,
        grid_shape=grid_shape, auto_mode="forward",
    )

    @jax.jit
    def eval_step(params, x, prev0, y):
        loss, stats = forward_chunk(
            params, x, prev0, y, jax.random.PRNGKey(0), 0.0
        )
        return loss, _r2_from_stats(stats)

    return eval_step


def _make_forward_chunk(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    *,
    padded_shape: Tuple[int, int],
    grid_shape: Tuple[int, int],
    auto_mode: str = "train",
    external_draws: bool = False,
):
    """Shared scan body of the seq2seq train/eval steps, returning
    ``(loss, (ss_res, s_y, s_y2, n))`` — R^2 sufficient statistics instead
    of R^2 itself, so data-parallel callers can psum them exactly
    (``_r2_from_stats`` rebuilds the chunk R^2).

    ``auto_mode`` picks which measured cell_impl='auto' crossover applies:
    the train step differentiates through this chunk (fused-BPTT numbers,
    pallas2 through B=8), the eval step does not (forward-only numbers,
    XLA wins beyond B=4).

    ``external_draws=True`` swaps the 5th argument from an rng key to a
    precomputed (T, B) Bernoulli matrix — the shard_map DP step draws
    globally outside the sharded body so every sample's teacher/feedback
    choice matches the single-device step bit-for-bit."""
    if config.in_channels < 2:
        raise ValueError("seq2seq feedback training needs a feedback channel")

    x_mean = jnp.asarray(normalizer.x_mean).reshape(-1, 1, 1)
    x_std = jnp.asarray(normalizer.x_std).reshape(-1, 1, 1)
    y_mean, y_std = normalizer.y_mean, normalizer.y_std

    def forward_chunk(params, x, prev0, y, rng_or_draws, teacher_prob):
        B, T = x.shape[:2]
        H, W = padded_shape
        xn = (x - x_mean) / x_std  # (B, T, 5, h, w)
        yn = (y - y_mean) / y_std  # (B, T, h, w)
        prev0n = (prev0 - y_mean) / y_std

        # pad the 5 forcing channels for ALL steps before the scan (only the
        # feedback channel changes per step and is padded in the body)
        xn_pad = jnp.moveaxis(pad_geo(xn, padded_shape), 2, -1)  # (B,T,H,W,5)
        xs = jnp.moveaxis(xn_pad, 1, 0)  # (T, B, H, W, 5)
        ys = jnp.moveaxis(yn, 1, 0)  # (T, B, h, w)
        if external_draws:
            draws = rng_or_draws  # (T, B) bool, drawn by the caller
        else:
            draws = jax.random.bernoulli(rng_or_draws, teacher_prob, (T, B))

        # the pallas2+remat resolution (mirrors convlstm_apply's auto rule):
        # the fused cells + whole-chunk BPTT store one carry copy per step
        # (vs ~3 for per-step T=1 custom VJPs) and backprop through the
        # fused Pallas backward kernels
        impl = config.cell_impl
        if impl == "auto":
            from nasa_niswan_tpu.models.convlstm import resolve_auto_impl

            impl = resolve_auto_impl(B, mode=auto_mode)
        if impl == "pallas2" and config.remat:
            from nasa_niswan_tpu.ops.convlstm_pallas2 import (
                col_margin,
                pad_cols,
                padded_cols,
            )
            from nasa_niswan_tpu.ops.seq2seq_bptt import scan_seq2seq_pallas2

            dt = jnp.dtype(config.compute_dtype)
            o2 = col_margin(config.kernel_sizes)
            wp = padded_cols(W, o2)
            xs_m = pad_cols(xs.astype(dt), o2, wp)  # (T, B, H, wp, C-1)
            from nasa_niswan_tpu.ops.vma import vary_like

            # fresh zeros are unvarying under shard_map manual axes; mark
            # them varying like the sharded inputs (as convlstm_apply does)
            state0 = vary_like(
                [
                    (
                        jnp.zeros((B, H, wp, hc), jnp.float32),
                        jnp.zeros((B, H, wp, hc), jnp.float32),
                    )
                    for hc in config.hidden_channels
                ],
                xs_m,
            )
            from nasa_niswan_tpu.models.convlstm import resolve_bptt_fwd

            _, preds = scan_seq2seq_pallas2(
                params, xs_m, prev0n, ys, draws.astype(jnp.float32), state0,
                tuple(config.kernel_sizes), o2, W, config.compute_dtype,
                padded_shape, grid_shape,
                (config.scan_unroll, config.train_scan_unroll),
                resolve_bptt_fwd(config.bptt_fwd),
            )
            err = ys - preds
            # identical to the per-step mean-of-means below (equal-size steps)
            loss = jnp.mean(err**2) + jnp.mean(jnp.abs(err))
            return loss, _chunk_stats(ys, preds)

        state = [
            (
                jnp.zeros((B, H, W, hc), jnp.float32),
                jnp.zeros((B, H, W, hc), jnp.float32),
            )
            for hc in config.hidden_channels
        ]

        def step(carry, inp):
            state, prev_pred = carry
            x_t, y_t, use_teacher = inp
            # the feedback channel (previous truth when teacher-forced, else
            # the previous prediction — decided at the END of the last step)
            fb = pad_geo(prev_pred, padded_shape)  # (B, H, W) normalized
            frame = jnp.concatenate([x_t, fb[..., None]], axis=-1)[:, None]
            pred_pad, new_state = convlstm_apply(
                params, frame, config, initial_state=state, return_state=True
            )
            pred = crop_to_grid(pred_pad[..., 0], grid_shape)  # (B, h, w)
            step_loss = jnp.mean((y_t - pred) ** 2) + jnp.mean(jnp.abs(y_t - pred))
            # next step's feedback: scheduled sampling per (t, sample)
            next_feedback = jnp.where(use_teacher[:, None, None], y_t, pred)
            return (new_state, next_feedback), (step_loss, pred)

        (_, _), (losses, preds) = jax.lax.scan(
            step, (state, prev0n), (xs, ys, draws)
        )
        loss = jnp.mean(losses)
        return loss, _chunk_stats(ys, preds)

    return forward_chunk


def _chunk_stats(ys, preds):
    """Chunk-level R^2 sufficient statistics in normalized space:
    ``_r2_from_stats`` of these equals 1 - ss_res/ss_tot on the flats."""
    flat_y = ys.reshape(-1)
    flat_p = preds.reshape(-1)
    return (
        jnp.sum((flat_y - flat_p) ** 2),
        jnp.sum(flat_y),
        jnp.sum(flat_y * flat_y),
        jnp.float32(flat_y.size),
    )


def fit_seq2seq(
    config: ConvLSTMConfig,
    params,
    dataset,
    *,
    val_dataset=None,
    normalizer: Optional[Normalizer] = None,
    padded_shape: Tuple[int, int],
    grid_shape: Tuple[int, int],
    num_epochs: int = 10,
    batch_size: int = 4,
    learning_rate: float = 1e-3,
    betas: Tuple[float, float] = (0.5, 0.999),
    schedule_k: float = 10.0,
    seed: int = 0,
    verbose: bool = True,
    snapshot_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    dp_devices: int = 1,
):
    """Scheduled-sampling fine-tuning driver over a Seq2SeqDataset.

    When ``val_dataset`` is given, each epoch also runs fully closed-loop
    (teacher_prob = 0) chunks over it — validation under the deployment
    condition, not the teacher-forced one.  ``snapshot_dir`` +
    ``checkpoint_every`` mirror the windowed trainer's epoch-NNN layout.

    ``dp_devices > 1`` trains data-parallel over a (dp,) mesh through the
    manual shard_map step (fused Pallas kernels per shard on TPU; globally
    drawn scheduled-sampling masks keep it bit-compatible with the
    single-device trajectory — tests/test_parallel.py pins this).
    """
    from nasa_niswan_tpu.train.loop import make_optimizer

    normalizer = normalizer or dataset.normalizer
    optimizer = make_optimizer(learning_rate, betas)
    opt_state = optimizer.init(params)
    batch_sharding = None
    if dp_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nasa_niswan_tpu.parallel.mesh import make_mesh

        if batch_size % dp_devices:
            raise ValueError(
                f"batch_size ({batch_size}) must be divisible by "
                f"dp_devices ({dp_devices})"
            )
        mesh = make_mesh(dp=dp_devices, devices=jax.devices()[:dp_devices])
        batch_sharding = NamedSharding(mesh, P("dp"))
        step = make_seq2seq_train_step_shardmap(
            config, normalizer, optimizer, padded_shape=padded_shape,
            grid_shape=grid_shape, mesh=mesh,
        )
    else:
        step = make_seq2seq_train_step(
            config, normalizer, optimizer, padded_shape=padded_shape,
            grid_shape=grid_shape,
        )
    eval_step = None
    if val_dataset is not None:
        eval_step = make_seq2seq_eval_step(
            config, normalizer, padded_shape=padded_shape, grid_shape=grid_shape
        )
    rng = jax.random.PRNGKey(seed)
    history = []
    for epoch in range(1, num_epochs + 1):
        tp = inverse_sigmoid_schedule(epoch, schedule_k)
        losses, r2s = [], []
        from nasa_niswan_tpu.data.pipeline import async_batches

        for x_b, p0_b, y_b in async_batches(
            dataset, batch_size, shuffle=True, seed=seed, epoch=epoch,
            sharding=batch_sharding,
        ):
            rng, srng = jax.random.split(rng)
            params, opt_state, m = step(
                params, opt_state, x_b, p0_b, y_b, srng, tp
            )
            losses.append(m["loss"])
            r2s.append(m["r2"])
        rec = {
            "epoch": epoch,
            "teacher_prob": tp,
            "loss": float(jnp.mean(jnp.stack(losses))),
            "r2": float(jnp.mean(jnp.stack(r2s))),
        }
        if eval_step is not None:
            v_r2s = []
            nv = len(val_dataset)
            for s in range(0, max(nv - nv % batch_size, 0) or nv, batch_size):
                items = [val_dataset[i] for i in range(s, min(s + batch_size, nv))]
                if len(items) < batch_size:  # pad to keep shapes static
                    items = items + [items[-1]] * (batch_size - len(items))
                xs, p0s, ys = zip(*items)
                _, r2v = eval_step(
                    params, np.stack(xs), np.stack(p0s), np.stack(ys)
                )
                v_r2s.append(r2v)
            rec["r2_val"] = float(jnp.mean(jnp.stack(v_r2s)))
        history.append(rec)
        if verbose:
            extra = (
                f", R2V: {rec['r2_val']:.5f}" if "r2_val" in rec else ""
            )
            print(
                f"[seq2seq] Epoch: {epoch}, tf_prob: {tp:.3f}, "
                f"Loss: {rec['loss']:.5f}, R2: {rec['r2']:.5f}{extra}"
            )
        if snapshot_dir and checkpoint_every and epoch % checkpoint_every == 0:
            import os

            from nasa_niswan_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(
                os.path.join(snapshot_dir, f"epoch-{epoch:03d}"),
                params, opt_state, learning_rate=learning_rate, epoch=epoch,
            )
    return params, opt_state, history
