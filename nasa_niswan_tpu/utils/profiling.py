"""Tracing / profiling (SURVEY.md §5).

The reference only measures wall-clock (train.py:27,144-145; %%timeit in
test.ipynb cells 59-60).  Here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` capturing a
    full XLA trace viewable in TensorBoard/Perfetto.
  * ``StepTimer`` — sustained step-time / model-days-per-min meter with a
    real device sync per window (jax.block_until_ready can return early
    through the axon tunnel, so the sync pulls one element to host).
  * ``layer_summary`` — torchsummary-style parameter table
    (test.ipynb cell 58 analog).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x: Any) -> None:
    """Force completion of all pending work contributing to x by pulling a
    single element to host (robust where block_until_ready is advisory)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


class StepTimer:
    """Sustained throughput meter for the training/rollout loops.

    >>> timer = StepTimer(steps_per_day=48)
    >>> for batch in batches:
    ...     out = step(...)
    ...     timer.tick(out, n_steps=seq_len, batch=B)
    >>> timer.summary()
    """

    def __init__(self, steps_per_day: int = 48, sync_every: int = 10):
        self.steps_per_day = steps_per_day
        self.sync_every = sync_every
        self._t0: Optional[float] = None
        self._model_steps = 0.0
        self._ticks = 0
        self.records: List[Dict[str, float]] = []

    def tick(self, out: Any, *, n_steps: int, batch: int = 1) -> None:
        self._ticks += 1
        self._model_steps += n_steps * batch
        if self._ticks % self.sync_every == 0:
            device_sync(out)
            now = time.perf_counter()
            if self._t0 is not None:
                elapsed = now - self._t0
                days = self._model_steps / self.steps_per_day
                self.records.append(
                    {
                        "elapsed_s": elapsed,
                        "model_days": days,
                        "model_days_per_min": days / (elapsed / 60.0),
                    }
                )
            self._t0 = now
            self._model_steps = 0.0

    def summary(self) -> Dict[str, float]:
        if not self.records:
            return {"model_days_per_min": float("nan"), "windows": 0}
        rates = [r["model_days_per_min"] for r in self.records]
        return {
            "model_days_per_min": float(np.mean(rates)),
            "best": float(np.max(rates)),
            "windows": len(self.records),
        }


def layer_summary(params: Any) -> str:
    """Parameter table over a params pytree (torchsummary analog,
    test.ipynb cell 58): one row per leaf with path, shape, count."""
    rows = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        rows.append((name, tuple(leaf.shape), n))
    width = max((len(r[0]) for r in rows), default=10) + 2
    lines = [f"{'layer':<{width}}{'shape':<24}{'params':>12}"]
    lines.append("-" * (width + 36))
    for name, shape, n in rows:
        lines.append(f"{name:<{width}}{str(shape):<24}{n:>12,}")
    lines.append("-" * (width + 36))
    lines.append(f"{'total':<{width}}{'':<24}{total:>12,}")
    return "\n".join(lines)
