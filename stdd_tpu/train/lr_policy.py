"""Learning-rate policies (reference slowfast/utils/lr_policy.py:9-98).

Epoch-continuous schedules: cosine and steps_with_relative_lrs, both with a
linear warmup from ``warmup_start_lr``. Returned as callables over the
*fractional epoch* (step / steps_per_epoch), exactly like the reference's
``get_epoch_lr``; ``as_optax_schedule`` adapts them to per-step optax form.
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
    """Piecewise-constant relative LRs over epoch milestones
    (lr_policy.py:52 get_step_index)."""
    bounds = list(steps) + [max_epoch]

    def fn(cur_epoch: float) -> float:
        for i, b in enumerate(bounds):
            if cur_epoch < b:
                return base_lr * lrs[i]
        return base_lr * lrs[-1]

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


def as_optax_schedule(policy: Callable[[float], float], steps_per_epoch: int):
    """Adapt an epoch-based policy to an optax per-step schedule."""
    import jax.numpy as jnp

    def sched(step):
        # piecewise evaluation must stay jittable: host-precompute a table
        raise NotImplementedError

    # precompute a dense table: one LR per step is overkill; per-iteration
    # granularity matches the reference's per-iter cosine
    def make(total_steps: int):
        import numpy as np

        table = jnp.asarray(
            [policy(s / steps_per_epoch) for s in range(total_steps + 1)],
            dtype=jnp.float32,
        )

        def sched_fn(step):
            idx = jnp.minimum(step, total_steps).astype(jnp.int32)
            return table[idx]

        return sched_fn

    return make
