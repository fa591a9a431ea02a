"""Checkpoint I/O with the reference's directory layout and restore semantics.

Layout (reference train.py:126-136): every N epochs a directory
``<snapshot_dir>/epoch-NNN/`` holding the model + optimizer state, the
current lr, and the epoch number.  Restore precedence for lr (reference
utils.py:34-50): explicit ``lr`` argument > lr stored in the checkpoint.

Format: a single ``checkpoint.npz`` of flattened pytree leaves plus a JSON
treedef — dependency-free, exactly round-trips (params, opt_state, epoch,
lr), and loads anywhere numpy does.  (Orbax is a fine alternative; a flat
npz keeps restarts free of async-checkpoint state and version skew.)
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

CKPT_FILE = "checkpoint.npz"
META_FILE = "checkpoint_meta.json"


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, str(treedef)


def save_checkpoint(
    directory: str,
    params: Any,
    opt_state: Any = None,
    *,
    learning_rate: Optional[float] = None,
    epoch: Optional[int] = None,
    model_state: Any = None,
) -> str:
    """``model_state`` carries non-parameter model buffers — the UNet's
    BatchNorm running statistics — mirroring torch's state_dict, which the
    reference checkpoints whole (utils.py:23-32); without them an
    eval/resume from checkpoint would run BN with fresh (0, 1) stats."""
    os.makedirs(directory, exist_ok=True)
    p_leaves, p_def = _flatten(params)
    o_leaves, o_def = _flatten(opt_state) if opt_state is not None else ([], "")
    s_leaves, s_def = (
        _flatten(model_state) if model_state is not None else ([], "")
    )
    arrays = {f"p{i}": np.asarray(x) for i, x in enumerate(p_leaves)}
    arrays.update({f"o{i}": np.asarray(x) for i, x in enumerate(o_leaves)})
    arrays.update({f"s{i}": np.asarray(x) for i, x in enumerate(s_leaves)})
    # Preemption-safe commit order: write-then-rename both files, npz first
    # and meta last — a SIGKILL mid-save leaves either no visible files or a
    # complete pair, never a torn checkpoint, and latest_epoch_dir treats
    # META_FILE as the commit marker.
    ckpt_tmp = os.path.join(directory, CKPT_FILE + ".tmp")
    with open(ckpt_tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(ckpt_tmp, os.path.join(directory, CKPT_FILE))
    meta = {
        "n_params": len(p_leaves),
        "n_opt": len(o_leaves),
        "n_state": len(s_leaves),
        "learning_rate": learning_rate,
        "epoch": epoch,
        "params_treedef": p_def,
        "opt_treedef": o_def,
        "state_treedef": s_def,
    }
    meta_tmp = os.path.join(directory, META_FILE + ".tmp")
    with open(meta_tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(meta_tmp, os.path.join(directory, META_FILE))
    return directory


_STATE_UNSET = object()  # distinguishes "no state wanted" from a None
# template (stateless families like the ConvLSTM have state=None)


def load_checkpoint(
    directory: str,
    params_template: Any,
    opt_state_template: Any = None,
    *,
    lr: Optional[float] = None,
    state_template: Any = _STATE_UNSET,
):
    """Restore (params, opt_state, meta) from a checkpoint directory —
    or (params, opt_state, model_state, meta) when ``state_template`` is
    given (BatchNorm running stats etc.; falls back to the template for
    checkpoints written before model_state existed).

    ``meta['learning_rate']`` reflects the reference's precedence: the ``lr``
    argument if given, else the stored lr (utils.py:44-50).  Templates supply
    the pytree structure (like torch load_state_dict needs a module).
    """
    with open(os.path.join(directory, META_FILE)) as f:
        meta = json.load(f)
    data = np.load(os.path.join(directory, CKPT_FILE))
    p_leaves = [data[f"p{i}"] for i in range(meta["n_params"])]
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template), p_leaves
    )
    opt_state = opt_state_template
    if opt_state_template is not None and meta["n_opt"]:
        o_leaves = [data[f"o{i}"] for i in range(meta["n_opt"])]
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt_state_template), o_leaves
        )
    meta["learning_rate"] = lr if lr is not None else meta.get("learning_rate")
    if state_template is _STATE_UNSET:
        return params, opt_state, meta
    model_state = state_template
    if meta.get("n_state") and state_template is not None:
        s_leaves = [data[f"s{i}"] for i in range(meta["n_state"])]
        model_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state_template), s_leaves
        )
    return params, opt_state, model_state, meta


def latest_epoch_dir(snapshot_dir: str) -> Optional[str]:
    """Most recent COMMITTED ``epoch-NNN`` directory (restart-from-latest
    for preemption recovery; the reference has no auto-resume).  A directory
    is committed once META_FILE exists — save_checkpoint renames it into
    place last, so a kill mid-save never surfaces a torn checkpoint here."""
    if not os.path.isdir(snapshot_dir):
        return None
    dirs = sorted(
        d for d in os.listdir(snapshot_dir)
        if d.startswith("epoch-")
        and os.path.isfile(os.path.join(snapshot_dir, d, META_FILE))
        and os.path.isfile(os.path.join(snapshot_dir, d, CKPT_FILE))
    )
    return os.path.join(snapshot_dir, dirs[-1]) if dirs else None
