"""Self-supervised landmark pretraining (VoxCeleb real-vs-shuffled).

Rebuild of ``dualrun/train/pretrain.py``: an :class:`~stdd_tpu.models.
dual_encoder.LMKDisc` learns to tell real landmark sequences (label 1) from
time-shuffled ones (label 0, ``make_shuffled`` at ``:102``; the shuffle
respects padding). ``remap_pretrained_to_lmk`` (:mod:`remap_pretrain_to_lmk`
``:24``) grafts the pretrained encoder onto a DualEncoderAU_LMK's lmk branch.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.dual_encoder import LMKDisc, lengths_to_mask
from .losses import bce_with_logits
from .step import TrainState


def make_shuffled(X: jnp.ndarray, lengths: jnp.ndarray, rng) -> jnp.ndarray:
    """Permute the time axis independently per sequence, valid frames only.

    Static-shape version of the reference's per-row loop: random keys are
    sorted within the valid prefix (invalid positions get +inf keys so they
    keep their place)."""
    B, T, D = X.shape
    pad = lengths_to_mask(lengths, T)
    keys = jax.random.uniform(rng, (B, T))
    keys = jnp.where(pad, jnp.inf, keys)
    # stable argsort of keys permutes valid positions, leaves pads at the end;
    # scatter the permuted valid frames back into their original slots
    order = jnp.argsort(keys, axis=1)
    permuted = jnp.take_along_axis(X, order[:, :, None], axis=1)
    # positions of valid slots, in order
    slot_keys = jnp.where(pad, 1.0, 0.0) + jnp.arange(T)[None, :] * 1e-6
    slots = jnp.argsort(slot_keys, axis=1)
    out = jnp.zeros_like(X)
    out = jax.vmap(lambda o, s, p: o.at[s].set(p))(out, slots, permuted)
    return jnp.where(pad[:, :, None], X, out)


def make_pretrain_step(model: LMKDisc, tx):
    def step(state: TrainState, L, lengths, rng):
        shuffle_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            Ls = make_shuffled(L, lengths, shuffle_rng)
            logit_r = model.apply(
                {"params": params}, L, lengths=lengths, train=True,
                rngs={"dropout": drop_rng},
            )
            logit_s = model.apply(
                {"params": params}, Ls, lengths=lengths, train=True,
                rngs={"dropout": drop_rng},
            )
            logits = jnp.concatenate([logit_r, logit_s])
            y = jnp.concatenate([jnp.ones_like(logit_r), jnp.zeros_like(logit_s)])
            loss = bce_with_logits(logits, y)
            acc = jnp.mean((logits > 0) == (y > 0.5))
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, state.batch_stats, opt, state.step + 1), {
            "loss": loss, "acc": acc,
        }

    return jax.jit(step)


def pretrain_lmk(
    model: LMKDisc,
    sequences: np.ndarray,      # [N, T, lmk_dim] (zero-padded)
    lengths: np.ndarray,        # [N]
    epochs: int = 5,
    batch: int = 64,
    lr: float = 3e-4,
    seed: int = 123,
    log=print,
) -> Dict[str, Any]:
    rng = jax.random.PRNGKey(seed)
    tx = optax.adamw(lr)
    T, D = sequences.shape[1], sequences.shape[2]
    variables = model.init(rng, jnp.zeros((1, T, D)), lengths=jnp.ones((1,), jnp.int32))
    state = TrainState(variables["params"], {}, tx.init(variables["params"]),
                       jnp.zeros((), jnp.int32))
    step_fn = make_pretrain_step(model, tx)
    N = len(sequences)
    history = []
    for ep in range(epochs):
        order = np.random.RandomState(seed + ep).permutation(N)
        losses, accs = [], []
        for s in range(0, N - batch + 1, batch):
            idx = order[s : s + batch]
            state, m = step_fn(
                state, jnp.asarray(sequences[idx]), jnp.asarray(lengths[idx]), rng
            )
            losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
        history.append({"epoch": ep + 1, "loss": float(np.mean(losses)),
                        "acc": float(np.mean(accs))})
        log(f"[pretrain {ep+1}/{epochs}] loss={history[-1]['loss']:.4f} "
            f"acc={history[-1]['acc']:.3f}")
    return {"params": state.params, "history": history}


def remap_pretrained_to_lmk(pretrain_params: Dict, dual_params: Dict) -> Dict:
    """Graft the pretrained ``enc`` branch into a dual encoder's ``lmk_enc``
    (remap_pretrain_to_lmk.py:24: enc.* → lmk_enc.*), shape-checked."""
    import copy

    out = copy.deepcopy(dict(dual_params))
    src = pretrain_params["enc"]

    def merge(dst, s):
        for k, v in s.items():
            if isinstance(v, dict):
                if k in dst:
                    merge(dst[k], v)
            elif k in dst and np.shape(dst[k]) == np.shape(v):
                dst[k] = v

    merge(out["lmk_enc"], src)
    return out
