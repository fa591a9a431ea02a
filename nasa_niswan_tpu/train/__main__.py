"""Training entry point: ``python -m nasa_niswan_tpu.train [flags]``.

Mirrors the reference CLI (train.py:230-235, launcher.sh) — writes
``configurations.json`` and ``logger.log`` to the snapshot dir, trains, and
checkpoints in ``epoch-NNN`` directories.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from nasa_niswan_tpu.data.dataset import SequenceDataset, SingleStepDataset
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
from nasa_niswan_tpu.models.registry import build_model
from nasa_niswan_tpu.train.checkpoint import load_checkpoint
from nasa_niswan_tpu.train.config import TrainConfig, parse_args
from nasa_niswan_tpu.train.loop import fit, make_optimizer
from nasa_niswan_tpu.utils.logging import LoggerDecorator


def load_data(config: TrainConfig) -> dict:
    if config.data_path:
        if config.data_path.endswith(".nc"):
            # direct single-file reader (E33OMA-90Days.nc, dataset.py:303)
            from nasa_niswan_tpu.data.netcdf import load_90days_nc

            return load_90days_nc(
                config.data_path,
                levels=config.levels if config.levels > 1 else None,
            )
        with np.load(config.data_path) as f:
            return dict(f)
    return synthetic_e33oma_90d(
        species=config.species, T=config.synthetic_steps, nlev=config.levels,
        H=config.synthetic_grid[0], W=config.synthetic_grid[1],
        seed=config.seed,
    )


def build_datasets(config: TrainConfig, bundle, data):
    if config.levels > 1:
        # config #2: fuse 3-D meteorology levels into channels (C = 3L+2)
        from nasa_niswan_tpu.data.fusion import fuse_levels

        data = fuse_levels(data, config.species, levels=config.levels)
        kw = dict(species=config.species)
    else:
        kw = dict(species=config.species, in_channels=config.in_channels)
    if bundle.is_sequence:
        mk = lambda period: SequenceDataset(
            data, period=period, sequence_length=config.sequence_length, **kw
        )
    else:
        mk = lambda period: SingleStepDataset(
            data, period=period, transform=config.transform, **kw
        )
    return mk("train"), mk("val")


def run_seq2seq(config: TrainConfig, data):
    """Config #3: scheduled-sampling training through the feedback channel
    (python -m nasa_niswan_tpu.train --mode seq2seq)."""
    from nasa_niswan_tpu.data.dataset import Seq2SeqDataset
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
    from nasa_niswan_tpu.rollout.seq2seq import fit_seq2seq

    if config.family != "LSTM":
        raise ValueError("--mode seq2seq drives the recurrent (LSTM) family")
    if config.levels > 1:
        from nasa_niswan_tpu.data.fusion import fuse_levels

        data = fuse_levels(data, config.species, levels=config.levels)
    mk = lambda period: Seq2SeqDataset(
        data, period=period, species=config.species,
        sequence_length=config.sequence_length,
    )
    train_ds, val_ds = mk("train"), mk("val")

    model_cfg = ConvLSTMConfig(
        in_channels=config.in_channels,
        hidden_channels=tuple(config.hidden_channels),
        kernel_sizes=tuple(config.kernel_size),
        compute_dtype=config.compute_dtype,
        cell_impl=config.cell_impl,
    )
    params = convlstm_init(jax.random.PRNGKey(config.seed), model_cfg)
    if config.use_checkpoint:
        # fine-tune from a windowed-training checkpoint (the canonical
        # protocol: windowed train -> seq2seq fine-tune -> rollout)
        tmpl_opt = make_optimizer(
            config.learning_rate, tuple(config.betas)
        ).init(params)
        params, _, _ = load_checkpoint(
            config.restore_from, params, tmpl_opt, lr=config.learning_rate
        )
    grid = tuple(data[1].shape[-2:]) if isinstance(data, tuple) else (
        data[f"{config.species}_conc"].shape[-2:]
    )
    params, opt_state, history = fit_seq2seq(
        model_cfg, params, train_ds,
        val_dataset=val_ds,
        padded_shape=tuple(config.input_size),
        grid_shape=tuple(grid),
        num_epochs=config.num_epochs,
        batch_size=config.batch_size,
        learning_rate=config.learning_rate,
        betas=tuple(config.betas),
        schedule_k=config.schedule_k,
        seed=config.seed,
        snapshot_dir=config.snapshot_dir,
        checkpoint_every=config.checkpoint_every,
        dp_devices=config.dp_devices,
    )
    # logger.npy parity: loss / train R2 / val R2 (train.py:138-142)
    os.makedirs(config.snapshot_dir, exist_ok=True)
    with open(os.path.join(config.snapshot_dir, "logger.npy"), "wb") as f:
        np.save(f, np.array([h["loss"] for h in history]))
        np.save(f, np.array([h["r2"] for h in history]))
        np.save(f, np.array([h.get("r2_val", np.nan) for h in history]))
    return {"params": params, "opt_state": opt_state, "history": history}


def main(config: TrainConfig):
    print(f"{config.model} deployed on {jax.devices()[0].device_kind}")
    data = load_data(config)
    if config.mode == "seq2seq":
        return run_seq2seq(config, data)
    bundle = build_model(
        config.model,
        in_channels=config.in_channels,
        hidden_channels=config.hidden_channels,
        kernel_sizes=config.kernel_size,
        compute_dtype=config.compute_dtype,
        cell_impl=config.cell_impl,
        precompute_input_conv=config.precompute_input_conv,
        unet_features=config.unet_features,
        pix2pix_features=config.pix2pix_features,
    )
    train_ds, val_ds = build_datasets(config, bundle, data)
    # static attribute channels apply to the surface configs only (the
    # fusion stack's in_channels are all dynamic); a 6-channel SINGLE-STEP
    # model's 6th channel is the previous-step FEEDBACK channel, which
    # SingleStepDataset provides itself (dataset.py:330 semantics)
    n_static = config.in_channels - 5 if config.levels == 1 else 0
    if not bundle.is_sequence and config.in_channels == 6:
        n_static = 0
    static = data["static"][:n_static] if n_static > 0 else None

    init_params = init_state = init_opt_state = None
    start_epoch = 1
    restore_dir = None
    if config.auto_resume and config.checkpoint_backend == "orbax":
        # preemption recovery through the async orbax backend: orbax commits
        # atomically (tmp + rename), so a SIGKILL mid-save is never visible
        from nasa_niswan_tpu.train.checkpoint_orbax import AsyncCheckpointer

        rng = jax.random.PRNGKey(config.seed)
        tmpl_params, tmpl_state = bundle.init(rng)
        tmpl_opt = make_optimizer(
            config.learning_rate, tuple(config.betas)
        ).init(tmpl_params)
        ck = AsyncCheckpointer(os.path.join(config.snapshot_dir, "orbax"))
        try:
            out = ck.restore_latest(
                tmpl_params, tmpl_opt, state_template=tmpl_state
            )
        finally:
            ck.close()
        if out is not None:
            if tmpl_state is None:  # stateless family: 3-tuple restore
                init_params, init_opt_state, meta = out
            else:
                init_params, init_opt_state, init_state, meta = out
            start_epoch = int(meta["epoch"]) + 1
            print("Number of Epochs:", meta.get("epoch"))
            print("Learning Rate:", meta.get("learning_rate"))
    elif config.auto_resume:
        # preemption recovery: restart from the newest epoch-NNN checkpoint
        # in the snapshot dir, if any (SURVEY.md §5 failure detection)
        from nasa_niswan_tpu.train.checkpoint import latest_epoch_dir

        restore_dir = latest_epoch_dir(config.snapshot_dir)
    elif config.use_checkpoint:
        restore_dir = config.restore_from
    if restore_dir:
        rng = jax.random.PRNGKey(config.seed)
        tmpl_params, tmpl_state = bundle.init(rng)
        tmpl_opt = make_optimizer(config.learning_rate, tuple(config.betas)).init(
            tmpl_params
        )
        init_params, init_opt_state, init_state, meta = load_checkpoint(
            restore_dir, tmpl_params, tmpl_opt, lr=config.learning_rate,
            state_template=tmpl_state,
        )
        if config.auto_resume and meta.get("epoch"):
            start_epoch = int(meta["epoch"]) + 1
        print("Number of Epochs:", meta.get("epoch"))
        print("Learning Rate:", meta.get("learning_rate"))

    if config.dp_devices > 1:
        from nasa_niswan_tpu.parallel.dp import fit_data_parallel

        return fit_data_parallel(
            bundle, train_ds, val_ds, config, static=static,
            init_params=init_params, init_state=init_state,
        )
    return fit(
        bundle, train_ds, val_ds, config, static=static,
        init_params=init_params, init_state=init_state,
        init_opt_state=init_opt_state, start_epoch=start_epoch,
    )


if __name__ == "__main__":
    from nasa_niswan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = parse_args()
    cfg.dump()
    print("Working Directory:", cfg.snapshot_dir)
    wrapped = LoggerDecorator(os.path.join(cfg.snapshot_dir, "logger.log"))(main)
    wrapped(cfg)
