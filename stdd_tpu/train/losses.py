"""Training losses (JAX) — the dualrun loss zoo plus shared binary losses.

Sources: reference ``dualrun/train/losses.py`` (BinaryFocalLoss ``:95``,
alignment ``:7``, uniformity ``:49``, mse_masked ``:110``, temporal InfoNCE
``:119``) and ``slowfast/models/losses.py`` (BCE-with-logits).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[float] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Numerically stable binary cross entropy on raw logits.

    Shape discipline is STRICTER than numpy broadcasting: any shape
    mismatch raises. One deliberate divergence from torch (whose
    ``binary_cross_entropy_with_logits`` raises on (B,1) logits vs (B,)
    targets): a trailing singleton class dim on ``logits`` (a Dense(1)
    head) is squeezed against 1-lower-rank targets as a convenience. A
    silent (B,1)×(B,) broadcast turns the loss into a (B,B) matrix whose
    gradient trains the model to predict the batch BASE RATE — caught
    on-chip as AUC ~0.5 after 1350 separable-data steps (round 4)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    if logits.ndim == targets.ndim + 1 and logits.shape[-1] == 1:
        logits = logits[..., 0]
    if logits.shape != targets.shape:
        raise ValueError(
            f"bce_with_logits: logits {logits.shape} vs targets "
            f"{targets.shape} must match (torch semantics — no broadcasting)"
        )
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if pos_weight is not None:
        w = jnp.where(targets == 1, pos_weight, 1.0)
        per = per * w
    if reduction == "mean":
        return jnp.mean(per)
    if reduction == "sum":
        return jnp.sum(per)
    return per


def binary_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: Optional[float] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """(1-p_t)^γ-modulated BCE with optional α class weighting
    (losses.py:95 BinaryFocalLoss). Same shape strictness as
    :func:`bce_with_logits` (the modulation term would silently broadcast a
    (B,1) head against (B,) targets otherwise)."""
    if logits.ndim == targets.ndim + 1 and logits.shape[-1] == 1:
        logits = logits[..., 0]
    targets = targets.astype(jnp.float32)
    bce = bce_with_logits(logits, targets, reduction="none")
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    pt = jnp.clip(jnp.where(targets == 1, p, 1 - p), 1e-6, 1 - 1e-6)
    loss = (1 - pt) ** gamma * bce
    if alpha is not None:
        loss = jnp.where(targets == 1, alpha * loss, (1 - alpha) * loss)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def alignment(embeddings: jnp.ndarray, labels: jnp.ndarray, alpha: float = 2.0) -> jnp.ndarray:
    """Label-aware alignment (Wang & Isola 2020; losses.py:7): mean
    ||x−y||^α over same-label pairs (i<j). Zero when no positive pairs."""
    n = embeddings.shape[0]
    if n < 2:
        return jnp.asarray(0.0)
    same = (labels[:, None] == labels[None, :]) & (
        jnp.triu(jnp.ones((n, n), bool), k=1)
    )
    d2 = jnp.sum(
        (embeddings[:, None, :] - embeddings[None, :, :]) ** 2, axis=-1
    )
    dist_pow = jnp.sqrt(jnp.maximum(d2, 1e-12)) ** alpha
    cnt = jnp.sum(same)
    return jnp.where(cnt > 0, jnp.sum(jnp.where(same, dist_pow, 0.0)) / jnp.maximum(cnt, 1), 0.0)


def uniformity(x: jnp.ndarray, t: float = 2.0, clip_value: float = 1e-6) -> jnp.ndarray:
    """log mean exp(−t·||xi−xj||²) over distinct pairs (losses.py:49)."""
    n = x.shape[0]
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    mask = jnp.triu(jnp.ones((n, n), bool), k=1)
    vals = jnp.where(mask, jnp.exp(-t * d2), 0.0)
    mean = jnp.sum(vals) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.log(jnp.maximum(mean, clip_value))


def mse_masked(pred: jnp.ndarray, target: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Masked MSE over [B,T,D]; mask [B,T] True = keep (losses.py:110)."""
    if mask is None:
        return jnp.mean((pred - target) ** 2)
    m = mask[..., None].astype(jnp.float32)
    return jnp.sum((pred - target) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)


def temporal_infonce(
    q: jnp.ndarray,
    k: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    temperature: float = 0.1,
) -> jnp.ndarray:
    """Frame-level InfoNCE between two branch projections (losses.py:119).

    q,k: [B,T,P]; mask [B,T] True = PAD. The reference gathers valid frames
    (dynamic shape); here invalid keys get −inf logits and invalid rows zero
    weight — identical objective, static shapes.
    """
    B, T, P = q.shape
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    qf = q.reshape(B * T, P)
    kf = k.reshape(B * T, P)
    logits = (qf @ kf.T) / temperature
    valid = (
        jnp.ones(B * T, bool) if mask is None else ~mask.reshape(B * T)
    )
    logits = jnp.where(valid[None, :], logits, -jnp.inf)
    logp = jax.nn.log_softmax(logits, axis=1)
    diag = jnp.diagonal(logp)
    per_row = jnp.where(valid, -diag, 0.0)
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(valid), 1)


def log1mexp(x: jnp.ndarray) -> jnp.ndarray:
    """log(1 − exp(x)) for x ≤ 0 (engine.py:157 _log1mexp)."""
    return jnp.where(
        x < -0.69314718056,
        jnp.log1p(-jnp.exp(x)),
        jnp.log(-jnp.expm1(x)),
    )


def noisy_or_group_logits(
    logits: jnp.ndarray, group_ids: jnp.ndarray, num_groups: int
) -> jnp.ndarray:
    """Per-group noisy-OR in logit space (engine.py:204
    _agg_noisyor_person_logits), with dense [0, num_groups) ids — jittable.

    logit(p_group) where p_group = 1 − ∏(1 − p_i) over the group's clips.
    Groups with no members get logit ≈ log1mexp(0)… masked out by callers.
    """
    s = jax.ops.segment_sum(
        jax.nn.log_sigmoid(-logits), group_ids, num_segments=num_groups
    )  # log ∏(1-p)
    return log1mexp(jnp.minimum(s, -1e-8)) - s
