"""One-at-a-Time (OAT) sensitivity analysis (reference: test.ipynb cells
56-57): perturb each input channel by a multiplicative factor, re-run the
compiled rollout, and measure the prediction deltas per channel.

The reference re-runs the full Python inference loop per feature (~23 s per
feature on its GPU); here each perturbed pass is the same compiled rollout
with a scaled input — and all perturbations can be folded into the batch
axis to run simultaneously.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def oat_sensitivity(
    rollout: Callable,
    params,
    forcings: np.ndarray,
    *,
    channels: Optional[Sequence[int]] = None,
    factor: float = 1.05,
    channel_names: Sequence[str] = ("u", "v", "w", "prec", "src"),
) -> Dict[str, np.ndarray]:
    """Returns {channel_name: |pred_perturbed - pred_base| (B, T, H, W)}.

    ``rollout(params, forcings) -> (preds, state)`` as built by
    make_rollout_fn; ``forcings`` raw (B, T, C, H, W); ``factor`` matches the
    reference's 1 + 0.05 perturbation (cell 56).
    """
    forcings = jnp.asarray(forcings)
    if channels is None:
        channels = range(min(forcings.shape[2], len(channel_names)))
    base, _ = rollout(params, forcings)
    base = np.asarray(base)
    out: Dict[str, np.ndarray] = {}
    for ci in channels:
        perturbed = forcings.at[:, :, ci].multiply(factor)
        pred, _ = rollout(params, perturbed)
        out[channel_names[ci]] = np.abs(np.asarray(pred) - base)
    return out
