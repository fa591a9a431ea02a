"""Load a training snapshot back into live objects.

The reference's train<->eval contract is the ``configurations.json`` the
trainer writes (train.py:220-225) and the notebook reloads (test.ipynb
cell 3) to rebuild the exact model + dataset before restoring a checkpoint
(cell 6).  ``load_snapshot`` is that contract as one call, shared by the
evaluation CLI (``python -m nasa_niswan_tpu.evalx``) and the serving CLI
(``python -m nasa_niswan_tpu.rollout``) so every snapshot kind — surface
(config #1), 20-level fusion (config #2), seq2seq feedback (config #3),
UNet-6ch feedback — routes identically everywhere.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class LoadedSnapshot:
    """Everything a snapshot consumer needs, reconstructed from a run dir."""

    cfg: Any  # TrainConfig
    bundle: Any  # models.registry ModelBundle
    dataset: Any  # the period's dataset (Seq2Seq/Sequence/SingleStep)
    params: Any
    eval_state: Any  # model_state (e.g. BN running stats) for eval
    meta: dict  # checkpoint metadata (epoch, lr, ...)
    static: Optional[np.ndarray]  # static-attribute channels or None
    n_forcing: int  # dynamic forcing channels (5, or 3*levels+2 fused)
    closed_loop: bool  # seq2seq feedback snapshot
    feedback_single: bool  # UNet-6ch feedback snapshot
    padded_shape: Tuple[int, int]


def load_snapshot(
    run_dir: str, *, epoch: Optional[int] = None, period: str = "test"
) -> LoadedSnapshot:
    """Rebuild model + dataset + checkpoint state from ``run_dir``.

    Mirrors ``train/__main__.build_datasets`` exactly — the consumer must
    round-trip every configurations.json the trainer writes, including
    config #2 (``--levels`` fusion) and config #3 (``--mode seq2seq``
    feedback snapshots).
    """
    import jax

    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.train.__main__ import load_data
    from nasa_niswan_tpu.train.checkpoint import (
        latest_epoch_dir,
        load_checkpoint,
    )
    from nasa_niswan_tpu.train.config import TrainConfig

    cfg = TrainConfig.load(os.path.join(run_dir, "configurations.json"))
    cfg.snapshot_dir = run_dir
    bundle = build_model(
        cfg.model, in_channels=cfg.in_channels,
        hidden_channels=cfg.hidden_channels, kernel_sizes=cfg.kernel_size,
        compute_dtype=cfg.compute_dtype, cell_impl=cfg.cell_impl,
        unet_features=cfg.unet_features,
        pix2pix_features=cfg.pix2pix_features,
    )
    data = load_data(cfg)
    n_forcing = 5
    if cfg.levels > 1:
        from nasa_niswan_tpu.data.fusion import fuse_levels, fusion_channel_count

        data = fuse_levels(data, cfg.species, levels=cfg.levels)
        n_forcing = fusion_channel_count(cfg.levels)
    closed_loop = cfg.mode == "seq2seq" and bundle.is_sequence
    if closed_loop:
        from nasa_niswan_tpu.data.dataset import Seq2SeqDataset

        dataset = Seq2SeqDataset(
            data, period=period, species=cfg.species,
            sequence_length=cfg.sequence_length,
        )
    elif bundle.is_sequence:
        from nasa_niswan_tpu.data.dataset import SequenceDataset

        kw = {} if cfg.levels > 1 else {"in_channels": cfg.in_channels}
        dataset = SequenceDataset(
            data, period=period, species=cfg.species,
            sequence_length=cfg.sequence_length, **kw,
        )
    else:
        from nasa_niswan_tpu.data.dataset import SingleStepDataset

        dataset = SingleStepDataset(
            data, period=period, species=cfg.species,
            in_channels=cfg.in_channels, transform=cfg.transform,
        )

    ckpt_dir = (
        os.path.join(run_dir, f"epoch-{epoch:03d}")
        if epoch is not None
        else latest_epoch_dir(run_dir)
    )
    if ckpt_dir is None:
        raise SystemExit(f"no epoch-NNN checkpoint under {run_dir}")
    tmpl_params, tmpl_state = bundle.init(jax.random.PRNGKey(cfg.seed))
    # model_state carries the UNet's BN running stats (torch state_dict
    # semantics, utils.py:23-32); older checkpoints fall back to the template
    params, _, eval_state, meta = load_checkpoint(
        ckpt_dir, tmpl_params, state_template=tmpl_state
    )

    # Static-attribute channels ride above the forcing stack (and the
    # feedback channel in seq2seq mode, train/config.py:71-72).  A 6-channel
    # single-step snapshot (UNet-6ch) has a FEEDBACK channel, not a static
    # one — it gets the closed loop of test.ipynb cell 8
    # ("if UNet-6ch and counter != 1: X[:, -1] = pred").
    feedback_single = bundle.family == "UNet" and cfg.in_channels == 6
    n_static = cfg.in_channels - n_forcing - (
        1 if (closed_loop or feedback_single) else 0
    )
    static = (
        data["static"][:n_static]
        if n_static > 0 and isinstance(data, dict) and "static" in data
        else None
    )
    return LoadedSnapshot(
        cfg=cfg, bundle=bundle, dataset=dataset, params=params,
        eval_state=eval_state, meta=meta, static=static, n_forcing=n_forcing,
        closed_loop=closed_loop, feedback_single=feedback_single,
        padded_shape=tuple(cfg.input_size),
    )
