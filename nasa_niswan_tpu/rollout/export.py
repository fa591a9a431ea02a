"""Frozen serving artifacts: serialize the compiled rollout for deployment.

`jax.export` lowers the state-carrying rollout — parameters baked in as
constants — to a self-contained StableHLO artifact that a serving process
can deserialize and call WITHOUT the model code, checkpoint files, or
normalization tables (they are all captured in the artifact).  This is the
deployment contract for the in-line ModelE-surrogate mode (BASELINE config
#5): ship one file per trained emulator, load it next to the host model,
feed forcing chunks, carry the returned state.

The artifact records the lowering platform (tpu/cpu) and the exact input
shapes: export per serving topology.  The reference has no equivalent
(its deployment story is "load the .pth and re-import model.py").
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from nasa_niswan_tpu.data.dataset import Normalizer
from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig
from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn


def rollout_state_spec(
    config: ConvLSTMConfig, batch: int, padded_shape: Tuple[int, int]
):
    """The standard-layout carry spec: per layer (h, c) zeros-shaped."""
    H, W = padded_shape
    return [
        (
            jax.ShapeDtypeStruct((batch, H, W, hc), np.float32),
            jax.ShapeDtypeStruct((batch, H, W, hc), np.float32),
        )
        for hc in config.hidden_channels
    ]


def initial_rollout_state(
    config: ConvLSTMConfig, batch: int, padded_shape: Tuple[int, int]
):
    """Zero carry in the standard layout (model.py:258-262 semantics)."""
    import jax.numpy as jnp

    H, W = padded_shape
    return [
        (
            jnp.zeros((batch, H, W, hc), jnp.float32),
            jnp.zeros((batch, H, W, hc), jnp.float32),
        )
        for hc in config.hidden_channels
    ]


def export_rollout(
    config: ConvLSTMConfig,
    normalizer: Normalizer,
    params,
    *,
    batch: int,
    chunk_steps: int,
    n_channels: int,
    grid_shape: Tuple[int, int] = (90, 144),
    padded_shape: Tuple[int, int] = (100, 154),
    static: Optional[np.ndarray] = None,
    cell_impl: Optional[str] = "auto",
    path: Optional[str] = None,
) -> bytes:
    """Serialize ``rollout(forcings, state) -> (preds, state)`` with the
    given trained ``params`` baked in.

    The exported callable takes raw forcings (batch, chunk_steps,
    n_channels, *grid_shape) and a standard-layout carry (use
    ``initial_rollout_state`` for the first chunk) and returns physical-
    unit predictions plus the next carry.  ``cell_impl`` follows the same
    auto policy as make_rollout_fn, resolved at export time for the
    lowering platform.  Writes the bytes to ``path`` when given.
    """
    rollout = make_rollout_fn(
        config,
        normalizer,
        padded_shape=padded_shape,
        grid_shape=grid_shape,
        static=static,
        cell_impl=cell_impl,
    )

    H, W = grid_shape
    W_std = padded_shape[1]

    def _standard_state(state):
        # the pallas2 cell carries a padded-column layout (wp > W_std);
        # normalize so the artifact's state contract is layout-stable and
        # impl-independent (convlstm_apply re-pads a standard carry)
        if state[0][0].shape[2] == W_std:
            return state
        from nasa_niswan_tpu.ops.convlstm_pallas2 import col_margin

        o2 = col_margin(config.kernel_sizes)
        return [
            (h[:, :, o2 : o2 + W_std, :], c[:, :, o2 : o2 + W_std, :])
            for h, c in state
        ]

    def serve(forcings, state):
        preds, st = rollout(params, forcings, state)
        return preds, _standard_state(st)

    exported = jax.export.export(jax.jit(serve))(
        jax.ShapeDtypeStruct(
            (batch, chunk_steps, n_channels, H, W), np.float32
        ),
        rollout_state_spec(config, batch, padded_shape),
    )
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_rollout(path_or_bytes):
    """Deserialize an exported rollout artifact into a callable
    ``rollout(forcings, state) -> (preds, state)``."""
    fn, _ = load_rollout_info(path_or_bytes)
    return fn


def load_rollout_info(path_or_bytes):
    """Deserialize an artifact and also report its fixed forcing signature.

    Returns ``(fn, (batch, chunk_steps, n_channels, h, w))`` — the shapes
    the artifact was exported with (serving must chunk to exactly these).
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax.export.deserialize(blob)
    return exported.call, tuple(exported.in_avals[0].shape)


def save_rollout_state(path: str, state, *, prev_norm=None) -> None:
    """Persist a rollout carry to ``.npz`` (standard layout, f32).

    ``state`` is the per-layer [(h, c), ...] carry every rollout returns;
    ``prev_norm`` optionally adds the closed-loop feedback frame
    (normalized space, so a resumed episode is bit-identical to an
    uninterrupted one).  This is the cross-invocation half of the in-line
    surrogate pattern: the host model stops, the carry file persists, the
    next invocation resumes the same episode.
    """
    arrays = {}
    for li, (h, c) in enumerate(state):
        arrays[f"h{li}"] = np.asarray(h, np.float32)
        arrays[f"c{li}"] = np.asarray(c, np.float32)
    if prev_norm is not None:
        arrays["prev_norm"] = np.asarray(prev_norm, np.float32)
    np.savez_compressed(path, **arrays)


def load_rollout_state(path: str):
    """Load a carry saved by ``save_rollout_state``.

    Returns ``(state, prev_norm)``; ``prev_norm`` is None for open-loop
    carries."""
    with np.load(path) as z:
        n_layers = sum(1 for k in z.files if k.startswith("h"))
        state = [(z[f"h{li}"], z[f"c{li}"]) for li in range(n_layers)]
        prev = z["prev_norm"] if "prev_norm" in z.files else None
    return state, prev
