"""AltFreezing — alternating parameter-group training (both rigs).

1. **I3D (AltFreezing proper, CVPR'23)** — the reference partitions conv
   parameters by kernel shape (``slowfast/models/optimizer.py:12``
   temporal_spatial_sep): [T>1,1,1] kernels → temporal group, [1,k,k] →
   spatial group, everything else (1x1x1 convs, the 5x7x7 stem, BN, head) →
   both groups; twin optimizers swap every ``ALTER_FREQ`` iterations
   (``optimizer.py:151`` construct_optimizer_altertraining).

2. **Dual encoder** — epoch-granularity phases joint → A(train AU, freeze
   LMK) → B(train LMK, freeze AU) → … → joint tail
   (``dualrun/train/altfreezing.py``).

JAX expression: a label pytree over params + a 0/1 active-mask tree fed to
:func:`masked_update`, which zeroes both gradients and updates of frozen
leaves — frozen params stay bit-identical. (Unlike torch, the Adam moments of
frozen leaves keep decaying toward zero; momentum restarts cleanly on
unfreeze. Documented deviation.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


# -- label trees --------------------------------------------------------------

TEMPORAL, SPATIAL, BOTH = "temporal", "spatial", "both"


def i3d_alt_labels(params) -> Any:
    """Label each I3D param leaf temporal/spatial/both by conv kernel shape
    (mirrors temporal_spatial_sep)."""

    def walk(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        is_conv_kernel = "kernel" in keys and leaf.ndim == 5
        if is_conv_kernel:
            kt, kh = leaf.shape[0], leaf.shape[1]
            if kt == 1 and kh > 1:
                return SPATIAL
            if kt > 1 and kh == 1:
                return TEMPORAL
            return BOTH  # 1x1x1 and the 5x7x7 stem
        return BOTH  # BN, linear, head

    return jax.tree_util.tree_map_with_path(walk, params)


def dual_labels(params) -> Any:
    """au / lmk / other labels for the dual encoder."""

    def walk(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[0] == "au_enc":
            return "au"
        if keys and keys[0] == "lmk_enc":
            return "lmk"
        return "other"

    return jax.tree_util.tree_map_with_path(walk, params)


def active_mask_from_labels(labels, active: Tuple[str, ...]):
    """Label tree → float 0/1 mask tree."""
    return jax.tree.map(lambda l: jnp.float32(1.0 if l in active else 0.0), labels)


def i3d_phase_mask(labels, step: jnp.ndarray, alter_freq: int):
    """Traced mask for the iteration-granularity I3D alternation: even
    periods train the temporal group, odd the spatial group; 'both' always."""
    train_temporal = ((step // alter_freq) % 2) == 0

    def pick(l):
        if l == BOTH:
            return jnp.float32(1.0)
        if l == TEMPORAL:
            return train_temporal.astype(jnp.float32)
        return (~train_temporal).astype(jnp.float32)

    return jax.tree.map(pick, labels)


# -- dual-encoder epoch phases (dualrun/train/altfreezing.py) -----------------

@dataclass(frozen=True)
class AltFreezeCfg:
    enabled: bool = True
    warmup_epochs: int = 2
    period: int = 2
    joint_tail: int = 2
    start_epoch: int = 1


def dual_phase(cfg: AltFreezeCfg, epoch: int, last_epoch: int) -> str:
    if not cfg.enabled:
        return "joint"
    if epoch < cfg.start_epoch:
        return "joint"
    if epoch < cfg.start_epoch + cfg.warmup_epochs:
        return "joint"
    if epoch > max(cfg.start_epoch, last_epoch - cfg.joint_tail):
        return "joint"
    k = (epoch - cfg.start_epoch - cfg.warmup_epochs) // max(1, cfg.period)
    return "A" if k % 2 == 0 else "B"


def dual_phase_active(phase: str) -> Tuple[str, ...]:
    """Phase → trainable labels (head/domain always trainable; A trains AU,
    B trains LMK — altfreezing.py:31 apply)."""
    if phase == "A":
        return ("au", "other")
    if phase == "B":
        return ("lmk", "other")
    return ("au", "lmk", "other")


# -- masked optimizer step ----------------------------------------------------

def masked_update(
    tx: optax.GradientTransformation,
    grads,
    opt_state,
    params,
    active_mask,
):
    """Gradient + update masking: frozen leaves receive zero gradient and a
    zero update, so their values never move (including weight decay)."""
    grads = jax.tree.map(lambda g, m: g * m, grads, active_mask)
    updates, new_opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u, m: u * m, updates, active_mask)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state
