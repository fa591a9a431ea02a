"""Learning-rate schedules.

The reference uses torch StepLR (train.py:72): lr is multiplied by gamma
every ``step_size`` epochs, stepping at epoch boundaries.
"""

from __future__ import annotations


def step_lr(base_lr: float, step_size: float, gamma: float, epoch_index: int) -> float:
    """LR for 0-based ``epoch_index`` under StepLR(step_size, gamma).

    torch semantics: epochs [0, step) run at base_lr, [step, 2*step) at
    base_lr*gamma, etc.  ``step_size`` arrives as float from the CLI
    (train.py:199 nargs=2 type=float) and is truncated like the reference's
    implicit int usage.
    """
    return base_lr * gamma ** (epoch_index // int(step_size))
