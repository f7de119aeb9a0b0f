"""Eval metrics, aggregation, threshold selection and temperature scaling —
host-side numpy (sources: dualrun/train/metrics.py, thresholds.py:13,
engine.py:131 fit_temperature_on_val, engine.py:162-230 aggregation)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def np_logit(p: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    p = np.clip(p, eps, 1 - eps)
    return np.log(p) - np.log1p(-p)


def ema_1d(x: np.ndarray, alpha: float) -> np.ndarray:
    """Causal EMA over the time axis of [B,T,D] (metrics.py:12 _ema1d)."""
    if alpha <= 0:
        return x
    y = x.copy()
    for t in range(1, x.shape[1]):
        y[:, t] = alpha * y[:, t - 1] + (1 - alpha) * x[:, t]
    return y


def metrics_from_logits(logits: np.ndarray, y: np.ndarray, threshold: float = 0.5) -> Dict[str, Any]:
    from sklearn.metrics import (
        accuracy_score,
        average_precision_score,
        confusion_matrix,
        f1_score,
        roc_auc_score,
    )

    probs = np.nan_to_num(sigmoid(logits), nan=0.5, posinf=1.0, neginf=0.0)
    preds = (probs >= threshold).astype(np.int64)
    cm = confusion_matrix(y, preds, labels=[0, 1])
    tn, fp, fn, tp = cm.ravel()
    tpr = tp / max(tp + fn, 1)
    fpr = fp / max(fp + tn, 1)
    out = {
        "tn": tn, "fp": fp, "fn": fn, "tp": tp,
        "TPR": tpr, "FPR": fpr,
        "balacc": 0.5 * (tpr + (1 - fpr)),
        "youden": tpr - fpr,
        "acc": accuracy_score(y, preds),
        "f1": f1_score(y, preds, zero_division=0),
        "probs": probs,
    }
    try:
        out["roc_auc"] = roc_auc_score(y, probs)
    except Exception:
        out["roc_auc"] = float("nan")
    try:
        out["pr_auc"] = average_precision_score(y, probs)
    except Exception:
        out["pr_auc"] = float("nan")
    return out


def _stats_at_threshold(probs, y, t) -> Dict[str, Any]:
    from sklearn.metrics import accuracy_score, confusion_matrix, f1_score

    preds = (probs >= t).astype(np.int64)
    tn, fp, fn, tp = confusion_matrix(y, preds, labels=[0, 1]).ravel()
    TPR = tp / max(tp + fn, 1)
    FPR = fp / max(fp + tn, 1)
    return {
        "tn": tn, "fp": fp, "fn": fn, "tp": tp, "TPR": TPR, "FPR": FPR,
        "balacc": 0.5 * (TPR + 1 - FPR), "youden": TPR - FPR,
        "acc": accuracy_score(y, preds), "f1": f1_score(y, preds, zero_division=0),
    }


def threshold_from_roc(
    probs: np.ndarray,
    y: np.ndarray,
    metric: str = "youden",
    target_fpr: Optional[float] = None,
) -> Tuple[float, Dict[str, Any]]:
    """Operating-point selection on the ROC (thresholds.py:13): youden /
    balacc / acc / f1 / auc-closest-corner, optional FPR constraint."""
    from sklearn.metrics import roc_curve

    fpr, tpr, thr = roc_curve(y, probs)

    def realized(t: float) -> float:
        # sklearn's (fpr=0, tpr=0, thr=inf) sentinel is unrealizable:
        # convert to a finite threshold just above the largest score
        # (same convention as eval/best.py:146-148) so callers never
        # serialize/deploy an inf operating point
        if not np.isfinite(t):
            return float(np.nextafter(np.max(probs), np.inf)) if len(probs) else 1.0
        return float(t)

    if target_fpr is not None:
        mask = fpr <= float(target_fpr)
        if not np.any(mask):
            idx = int(np.argmin(fpr))
        else:
            idx = int(np.arange(len(fpr))[mask][int(np.argmax(tpr[mask]))])
        t = realized(thr[idx])
        return t, _stats_at_threshold(probs, y, t)
    if metric == "youden":
        idx = int(np.argmax(tpr - fpr))
    elif metric == "balacc":
        idx = int(np.argmax(0.5 * (tpr + 1 - fpr)))
    elif metric == "auc":
        mask = np.isfinite(thr)
        if not mask.any():
            idx = int(np.argmax(tpr - fpr))
        else:
            d2 = fpr[mask] ** 2 + (1 - tpr[mask]) ** 2
            idx = int(np.where(mask)[0][int(np.argmin(d2))])
    else:
        key = {"acc": "acc", "f1": "f1"}.get(metric, "youden")
        # O(n): acc/f1 per ROC point from the cumulative counts the curve
        # already encodes (a per-threshold confusion_matrix sweep is O(n^2)
        # and stalls large val splits on the 1-core host)
        n_pos = float(np.sum(y == 1))
        n_neg = float(len(y) - n_pos)
        tp = tpr * n_pos
        fp = fpr * n_neg
        if key == "acc":
            scores = (tp + (n_neg - fp)) / max(1.0, n_pos + n_neg)
        else:  # f1
            denom = 2 * tp + fp + (n_pos - tp)
            scores = np.where(denom > 0, 2 * tp / np.maximum(denom, 1e-12), 0.0)
        idx = int(np.argmax(scores))
    t = realized(thr[idx])
    return t, _stats_at_threshold(probs, y, t)


def fit_temperature(val_logits: np.ndarray, val_y: np.ndarray) -> float:
    """Platt-style temperature: minimize BCE(sigmoid(z/T), y) + 1e-4(T−1)²
    over T, clamp to [0.25, 20] (engine.py:131). scipy L-BFGS-B replaces the
    torch LBFGS."""
    from scipy.optimize import minimize_scalar

    z = np.asarray(val_logits, np.float64)
    y = np.asarray(val_y, np.float64)

    def nll(T):
        T = np.clip(T, 1e-2, 1e3)
        zz = z / T
        bce = np.mean(np.maximum(zz, 0) - zz * y + np.log1p(np.exp(-np.abs(zz))))
        return bce + 1e-4 * (T - 1.0) ** 2

    try:
        res = minimize_scalar(nll, bounds=(0.25, 20.0), method="bounded")
        return float(np.clip(res.x, 0.25, 20.0))
    except Exception:
        return 1.0


# -- clip → person → video aggregation (engine.py:162-230) -------------------

def group_median_probs(logits: np.ndarray, ids: np.ndarray):
    """(uniq_ids, per-group median prob) sorted by id."""
    p = sigmoid(np.asarray(logits, np.float64))
    order = np.argsort(ids, kind="stable")
    ids_s, p_s = np.asarray(ids)[order], p[order]
    uniq, starts = np.unique(ids_s, return_index=True)
    meds = np.array([np.median(c) for c in np.split(p_s, starts[1:])])
    return uniq, meds, order, starts


def agg_person_median(logits: np.ndarray, y: np.ndarray, trk: np.ndarray):
    """Track-median prob + majority label (engine.py:232)."""
    uniq, meds, order, starts = group_median_probs(logits, trk)
    y_s = np.asarray(y)[order]
    y_person = np.array([float(c.mean() >= 0.5) for c in np.split(y_s, starts[1:])])
    return meds, y_person


def topks_correct(preds: np.ndarray, labels: np.ndarray, ks):
    """Number of top-k-correct predictions per k (reference
    slowfast/utils/metrics.py:9 topks_correct): ``preds`` [N, C] scores,
    ``labels`` [N] class indices."""
    preds = np.asarray(preds)
    labels = np.asarray(labels).reshape(-1)
    assert preds.shape[0] == labels.shape[0], (
        "Batch dim of predictions and labels must match"
    )
    max_k = max(ks)
    # descending top-max_k class indices per sample
    top_inds = np.argsort(-preds, axis=1, kind="stable")[:, :max_k]  # [N, max_k]
    correct = top_inds == labels[:, None]                            # [N, max_k]
    return [float(correct[:, :k].sum()) for k in ks]


def topk_accuracies(preds, labels, ks):
    """Top-k accuracy (%) per k (reference metrics.py:58)."""
    n = np.asarray(preds).shape[0]
    return [c / n * 100.0 for c in topks_correct(preds, labels, ks)]


def topk_errors(preds, labels, ks):
    """Top-k error (%) per k (reference metrics.py:46)."""
    n = np.asarray(preds).shape[0]
    return [(1.0 - c / n) * 100.0 for c in topks_correct(preds, labels, ks)]


def agg_video_noisyor(logits: np.ndarray, y: np.ndarray, trk: np.ndarray, vid: np.ndarray):
    """Person median → video noisy-OR (engine.py:177
    _agg_video_from_person_median)."""
    uniq_t, p_person, order, starts = group_median_probs(logits, trk)
    y_s = np.asarray(y)[order]
    vid_s = np.asarray(vid)[order]
    y_person = np.array([float(c.mean() >= 0.5) for c in np.split(y_s, starts[1:])])
    vid_person = np.array([c[0] for c in np.split(vid_s, starts[1:])])

    order2 = np.argsort(vid_person, kind="stable")
    v2, pp2, yp2 = vid_person[order2], p_person[order2], y_person[order2]
    uniq_v, starts_v = np.unique(v2, return_index=True)
    p_video, y_video = [], []
    for pc, yc in zip(np.split(pp2, starts_v[1:]), np.split(yp2, starts_v[1:])):
        pcl = np.clip(pc, 1e-6, 1 - 1e-6)
        s = np.sum(np.log1p(-pcl))
        p_video.append(1.0 - max(np.exp(s), 1e-12))
        y_video.append(float(yc.max()))
    return np.asarray(p_video), np.asarray(y_video)
