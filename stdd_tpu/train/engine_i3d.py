"""AltFreezing trainer for the I3D classifier (the CVPR'23 mechanism).

The reference rig: twin optimizers over a temporal/spatial parameter
partition swapped every ``ALTER_FREQ`` iterations
(``slowfast/models/optimizer.py:151`` construct_optimizer_altertraining),
BN parameters excluded from weight decay (``:106`` construct_optimizer +
``setting/ftcn_tt.yaml`` BN.WEIGHT_DECAY=0), LR policies from
``slowfast/utils/lr_policy.py``, precise-BN recomputation
(``slowfast/utils/bn_helper.py:11``), epoch checkpoints with resume
(``slowfast/utils/checkpoint.py``).

JAX shape: ONE optimizer + a per-iteration traced phase mask
(:func:`~stdd_tpu.train.altfreeze.i3d_phase_mask`) — the mask zeroes both
grads and updates of the inactive group, so the alternation happens inside a
single compiled step with no python-side optimizer swapping. Sync-BN across
the data mesh axis is free under GSPMD (batch stats reduce globally).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .altfreeze import i3d_alt_labels, i3d_phase_mask, masked_update
from .losses import bce_with_logits
from .lr_policy import cosine_lr, step_decay, with_warmup
from .step import TrainState


@dataclass
class I3DTrainArgs:
    """SOLVER defaults from the shipped configs (i3d_ori.py:33-43 inline yaml
    + setting/ftcn_tt.yaml SOLVER)."""

    base_lr: float = 0.04
    lr_policy: str = "cosine"          # cosine | step
    max_epoch: int = 100
    momentum: float = 0.9
    weight_decay: float = 1e-4
    bn_weight_decay: float = 0.0
    warmup_epochs: float = 10.0
    warmup_start_lr: float = 0.01
    optimizer: str = "sgd"             # sgd | adam
    nesterov: bool = False
    dampening: float = 0.0
    step_size: float = 100.0           # for lr_policy=step
    gamma: float = 0.5
    alter_freq: int = 20               # AltFreezing swap period (iterations)
    grad_clip: Optional[float] = None
    steps_per_epoch: int = 100
    seed: int = 0


def _is_bn_path(path) -> bool:
    return any(getattr(p, "key", str(p)) == "bn" for p in path)


def _trace_with_dampening(decay: float, dampening: float) -> optax.GradientTransformation:
    """torch.optim.SGD momentum with dampening: buf = decay·buf +
    (1−dampening)·grad (SOLVER.DAMPENING, slowfast/models/optimizer.py —
    optax.trace has no dampening knob). torch forbids nesterov+dampening."""

    def init(params):
        return optax.TraceState(trace=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        new_trace = jax.tree.map(
            lambda t, g: decay * t + (1.0 - dampening) * g, state.trace, updates
        )
        return new_trace, optax.TraceState(trace=new_trace)

    return optax.GradientTransformation(init, update)


def make_i3d_optimizer(params, args: I3DTrainArgs, lr_schedule) -> optax.GradientTransformation:
    """SGD-momentum / Adam with weight decay masked off BN parameters
    (construct_optimizer semantics)."""
    not_bn = jax.tree_util.tree_map_with_path(lambda p, _: not _is_bn_path(p), params)
    chain = []
    if args.grad_clip:
        chain.append(optax.clip_by_global_norm(args.grad_clip))
    if args.optimizer == "sgd":
        chain += [
            optax.add_decayed_weights(args.weight_decay, mask=not_bn),
        ]
        if args.bn_weight_decay:
            is_bn = jax.tree.map(lambda m: not m, not_bn)
            chain.append(optax.add_decayed_weights(args.bn_weight_decay, mask=is_bn))
        if args.dampening:
            if args.nesterov:
                raise ValueError("nesterov requires dampening=0 (torch SGD)")
            mom = _trace_with_dampening(args.momentum, args.dampening)
        else:
            mom = optax.trace(decay=args.momentum, nesterov=args.nesterov)
        chain += [
            mom,
            optax.scale_by_learning_rate(lr_schedule),
        ]
    else:
        chain += [
            optax.scale_by_adam(),
            optax.add_decayed_weights(args.weight_decay, mask=not_bn),
            optax.scale_by_learning_rate(lr_schedule),
        ]
    return optax.chain(*chain)


def make_lr_schedule(args: I3DTrainArgs):
    if args.lr_policy == "cosine":
        pol = cosine_lr(args.base_lr, args.max_epoch)
    else:
        pol = step_decay(args.base_lr, args.step_size, args.gamma)
    pol = with_warmup(pol, args.warmup_epochs, args.warmup_start_lr)
    total = args.max_epoch * args.steps_per_epoch
    table = jnp.asarray(
        [pol(s / args.steps_per_epoch) for s in range(total + 1)], jnp.float32
    )

    def sched(step):
        return table[jnp.minimum(step, total).astype(jnp.int32)]

    return sched


def make_i3d_train_step(model, tx, labels, alter_freq: int, loss_fn=bce_with_logits):
    """Jitted AltFreezing step: the phase mask is derived from the traced
    iteration counter, so both phases live in one compiled program."""

    def step(state: TrainState, clips, targets, rng):
        mask = i3d_phase_mask(labels, state.step, alter_freq)
        dropout_rng = jax.random.fold_in(rng, state.step)

        def compute(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                clips,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            return loss_fn(logits, targets), (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        new_params, new_opt = masked_update(tx, grads, state.opt_state, state.params, mask)
        probs = jax.nn.sigmoid(logits.reshape(-1))
        metrics = {
            "loss": loss,
            "acc": jnp.mean((probs > 0.5) == (targets.reshape(-1) > 0.5)),
            "grad_norm": optax.global_norm(grads),
            "phase_temporal": ((state.step // alter_freq) % 2 == 0).astype(jnp.float32),
        }
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            metrics,
        )

    return jax.jit(step)


def init_i3d_training(model, args: I3DTrainArgs, sample_clips):
    rng = jax.random.PRNGKey(args.seed)
    variables = jax.jit(lambda r: model.init(r, sample_clips, train=False))(rng)
    params = variables["params"]
    sched = make_lr_schedule(args)
    tx = make_i3d_optimizer(params, args, sched)
    state = TrainState(params, variables["batch_stats"], tx.init(params), jnp.zeros((), jnp.int32))
    labels = i3d_alt_labels(params)
    step_fn = make_i3d_train_step(model, tx, labels, args.alter_freq)
    return state, step_fn, sched


def precise_bn_update(model, state: TrainState, batches: Iterable, momentum_override=None):
    """Recompute BN running stats over N batches with true batch statistics
    (bn_helper.py:11 compute_and_update_bn_stats): average the per-batch
    means/vars instead of EMA-updating them."""
    sums = None
    count = 0

    @jax.jit
    def batch_stats_of(params, batch_stats, clips):
        _, mutated = model.apply(
            {"params": params, "batch_stats": _zero_momentum_stats(batch_stats)},
            clips,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return mutated["batch_stats"]

    def _zero_momentum_stats(bs):
        return bs

    for clips in batches:
        # with flax momentum m: new = m*old + (1-m)*batch; recover batch stats
        stats = batch_stats_of(state.params, state.batch_stats, clips)
        m = 1.0 - 0.1  # flax decay used in our BN layers (bn_momentum=0.1)
        batch_only = jax.tree.map(
            lambda new, old: (new - m * old) / (1.0 - m),
            stats,
            state.batch_stats,
        )
        sums = batch_only if sums is None else jax.tree.map(jnp.add, sums, batch_only)
        count += 1
    if count == 0:
        return state
    mean_stats = jax.tree.map(lambda s: s / count, sums)
    return TrainState(state.params, mean_stats, state.opt_state, state.step)
