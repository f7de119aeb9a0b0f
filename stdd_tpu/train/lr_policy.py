"""Learning-rate policies (reference slowfast/utils/lr_policy.py:9-98).

Epoch-continuous schedules: cosine and steps_with_relative_lrs, both with a
linear warmup from ``warmup_start_lr``. Returned as callables over the
*fractional epoch* (step / steps_per_epoch), exactly like the reference's
``get_epoch_lr``; ``engine_i3d.make_lr_schedule`` precomputes the per-step
table that bridges them into jittable optax form.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence


def cosine_lr(base_lr: float, max_epoch: float) -> Callable[[float], float]:
    def fn(cur_epoch: float) -> float:
        return base_lr * 0.5 * (math.cos(math.pi * cur_epoch / max_epoch) + 1.0)

    return fn


def steps_with_relative_lrs(
    base_lr: float, steps: Sequence[float], lrs: Sequence[float], max_epoch: float
) -> Callable[[float], float]:
    """Piecewise-constant relative LRs over epoch milestones, mirroring the
    reference index convention exactly (lr_policy.py:60,:75): ``steps``
    carries a LEADING ZERO (the convention multigrid.lr_boundaries emits,
    with len(lrs) == len(steps)) and the LR for the first epoch with
    ``cur_epoch < steps[ind]`` is ``lrs[ind - 1]``."""
    if len(lrs) != len(steps):
        raise ValueError(
            f"steps_with_relative_lrs: len(lrs)={len(lrs)} must equal "
            f"len(steps)={len(steps)} (reference lr_policy.py:60 convention)")
    if not steps or steps[0] != 0:
        # without the leading zero, an epoch below steps[0] would hit
        # lrs[-1] via Python negative indexing — a silently wrong LR
        # (ADVICE r2 #1); fail loudly instead
        raise ValueError(
            f"steps_with_relative_lrs: steps must carry a leading 0 "
            f"(got {list(steps)!r}); reference configs always do "
            f"(multigrid.lr_boundaries emits it)")
    bounds = list(steps) + [max_epoch]

    def fn(cur_epoch: float) -> float:
        ind = len(bounds) - 1
        for i, b in enumerate(bounds):
            if cur_epoch < b:
                ind = i
                break
        return base_lr * lrs[ind - 1]

    return fn


def step_decay(base_lr: float, step_size: float, gamma: float) -> Callable[[float], float]:
    """LR_POLICY 'step' used by the ftcn solver (SOLVER.STEP_SIZE/GAMMA)."""

    def fn(cur_epoch: float) -> float:
        return base_lr * gamma ** math.floor(cur_epoch / step_size)

    return fn


def with_warmup(
    policy: Callable[[float], float],
    warmup_epochs: float,
    warmup_start_lr: float,
) -> Callable[[float], float]:
    """Linear warmup toward the policy's value at warmup end
    (lr_policy.py:9-32 get_lr_at_epoch)."""

    def fn(cur_epoch: float) -> float:
        lr = policy(cur_epoch)
        if cur_epoch < warmup_epochs:
            lr_end = policy(warmup_epochs)
            alpha = (lr_end - warmup_start_lr) / warmup_epochs
            lr = cur_epoch * alpha + warmup_start_lr
        return lr

    return fn


