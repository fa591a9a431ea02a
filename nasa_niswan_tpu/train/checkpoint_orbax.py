"""Async Orbax checkpoint backend (optional alternative to the npz format).

The npz backend (train/checkpoint.py) is synchronous and dependency-free —
fine for the reference's every-10-epochs cadence.  For production TPU runs
where preemption coverage wants frequent checkpoints without stalling the
step loop, this wraps orbax's async CheckpointManager: saves overlap
training, old steps are garbage-collected, restore-latest is built in.

Layout: <dir>/<step>/... managed by orbax; metadata (epoch, lr) rides in
the saved pytree, so restore has the same information the npz format
carries.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

try:  # pragma: no cover - orbax is in the TPU image; gate for safety
    import orbax.checkpoint as ocp

    HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    ocp = None
    HAVE_ORBAX = False


def _require():
    if not HAVE_ORBAX:
        raise ImportError("orbax-checkpoint is required for the async backend")


class AsyncCheckpointer:
    """Minimal async checkpoint manager for (params, opt_state, meta).

    >>> ckpt = AsyncCheckpointer(dir, max_to_keep=3)
    >>> ckpt.save(epoch, params, opt_state, learning_rate=lr)   # non-blocking
    >>> params, opt_state, meta = ckpt.restore_latest(params, opt_state)
    >>> ckpt.close()                                            # drain saves
    """

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        _require()
        import os

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any = None,
        *,
        learning_rate: Optional[float] = None,
        model_state: Any = None,
    ) -> None:
        payload = {
            "params": params,
            "opt_state": opt_state if opt_state is not None else {},
            # non-parameter buffers (UNet BN running stats) — torch
            # state_dict semantics, like train/checkpoint.py
            "model_state": model_state if model_state is not None else {},
            "meta": {
                "epoch": step,
                "learning_rate": (
                    learning_rate if learning_rate is not None else -1.0
                ),
            },
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore_latest(
        self,
        params_template: Any = None,
        opt_state_template: Any = None,
        state_template: Any = None,
    ):
        """Returns (params, opt_state, meta), or (params, opt_state,
        model_state, meta) when ``state_template`` is given.

        With BOTH ``params_template`` and ``opt_state_template``, restores
        INTO the templates (ocp StandardRestore), so structured containers
        — the optax InjectHyperparamsState/ScaleByAdamState namedtuples —
        come back as their original types, resumable directly into the
        train step.  This template path requires the checkpoint to have
        been saved with the same fields present (the trainer always saves
        opt_state).  Otherwise restores as-saved (nested dicts; templates
        serve only as the fallback for pieces the checkpoint lacks)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        if params_template is not None and opt_state_template is not None:
            tmpl = {
                "params": params_template,
                "opt_state": opt_state_template,
                "model_state": (
                    state_template if state_template is not None else {}
                ),
                "meta": {"epoch": 0, "learning_rate": -1.0},
            }
            out = self._mgr.restore(step, args=ocp.args.StandardRestore(tmpl))
        else:
            out = self._mgr.restore(step)
        meta = dict(out["meta"])
        if meta.get("learning_rate", -1.0) < 0:
            meta["learning_rate"] = None

        def restored_or(key, template):
            # a save with None stores {}; {} or a missing key (pre-
            # model_state checkpoints) falls back to the template.  No
            # truthiness on the value itself — a pytree may be a bare
            # ndarray.
            val = out.get(key)
            absent = val is None or (isinstance(val, dict) and not val)
            return template if absent else val

        opt_state = restored_or("opt_state", opt_state_template)
        if state_template is None:
            return out["params"], opt_state, meta
        return out["params"], opt_state, restored_or(
            "model_state", state_template
        ), meta

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
