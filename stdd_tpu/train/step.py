"""Data-parallel training step for the I3D classifier.

Replaces the reference's DDP + NCCL all-reduce machinery
(``model/_base.py:110`` make_distributed, ``slowfast/utils/distributed.py``):
under ``jit`` with a sharded batch, XLA computes global loss/BN statistics and
inserts the gradient collectives itself — there is nothing to hand-schedule.

The AltFreezing alternating spatial/temporal update (reference
``slowfast/models/optimizer.py:151`` construct_optimizer_altertraining with
``temporal_spatial_sep`` at ``:12``) is expressed as an optax ``multi_transform``
over a pytree partition mask computed from conv kernel shapes — see
``stdd_tpu/train/altfreeze.py``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict


@dataclasses.dataclass
class TrainState:
    """Minimal mutable-by-replace train state (pytree)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), None),
    lambda _, children: TrainState(*children),
)


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Flattening wrapper over the shared loss (train/losses.py)."""
    from .losses import bce_with_logits as _bce

    return _bce(logits.reshape(-1), labels.reshape(-1))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable = bce_with_logits,
) -> Callable:
    """Return ``step(state, clips, labels, rng) -> (state, metrics)``.

    ``clips``: [B, T, H, W, 3] normalized float; ``labels``: [B] in {0,1}.
    Jit this under a mesh with the batch sharded on the data axis; params and
    optimizer state replicated.
    """

    def train_step(state: TrainState, clips, labels, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                clips,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            return loss_fn(logits, labels), (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        probs = jax.nn.sigmoid(logits.reshape(-1))
        acc = jnp.mean((probs > 0.5) == (labels.reshape(-1) > 0.5))
        metrics = {
            "loss": loss,
            "acc": acc,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def init_train_state(model, tx, rng, sample_input) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
