"""Seed/variance evaluation methodology (the reference's ds.py).

For each seed: ratio-matched real/fake subsample of a per-video score table,
5-fold stratified per-fold metrics (mean ± sd), and a stratified bootstrap
(B=2000) 95% CI on the full pool (ds.py:116 run_one). ``summarize`` pools
seeds into the ``summary_variability`` artifact the reference versions under
``new_demo_test/results_suite``.
"""

from __future__ import annotations

import csv
import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from .best import bootstrap_ci


@dataclass
class VariabilityConfig:
    threshold: float = 0.4
    fake_per_real: float = 1.0
    bootstrap: int = 2000
    n_folds: int = 5
    seeds: Sequence[int] = (42, 43, 44, 45, 46)


def ratio_match_indices(y: np.ndarray, fake_per_real: float, rng) -> np.ndarray:
    """Subsample fakes to a fixed fakes-per-real ratio (ds.py pool step)."""
    pos = np.where(y == 1)[0]
    neg = np.where(y == 0)[0]
    n_fake = min(len(pos), int(round(len(neg) * fake_per_real)))
    pos_sel = rng.choice(pos, n_fake, replace=False)
    return np.concatenate([neg, pos_sel])


def run_one(y: np.ndarray, scores: np.ndarray, seed: int, cfg: VariabilityConfig) -> Dict:
    from sklearn.metrics import (
        average_precision_score,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )
    from sklearn.model_selection import StratifiedKFold

    rng = np.random.default_rng(seed)
    idx = ratio_match_indices(np.asarray(y), cfg.fake_per_real, rng)
    yt, st = np.asarray(y)[idx], np.asarray(scores)[idx]

    skf = StratifiedKFold(n_splits=cfg.n_folds, shuffle=True, random_state=seed)
    per_fold = []
    for k, (_, fold) in enumerate(skf.split(yt, yt), start=1):
        yf, sf = yt[fold], st[fold]
        if len(np.unique(yf)) < 2:
            # a class with fewer members than n_folds leaves this fold
            # single-class; AUC/AP are undefined there — record NaN instead
            # of crashing the whole seed suite after the expensive eval ran
            per_fold.append({"fold": k, "n": int(len(fold)),
                             "auc": float("nan"), "ap": float("nan"),
                             "f1_macro": float("nan"),
                             "precision_macro": float("nan"),
                             "recall_macro": float("nan"),
                             "single_class": True})
            continue
        yhat = (sf >= cfg.threshold).astype(int)
        per_fold.append({
            "fold": k, "n": int(len(fold)),
            "auc": float(roc_auc_score(yf, sf)),
            "ap": float(average_precision_score(yf, sf)),
            "f1_macro": float(f1_score(yf, yhat, average="macro")),
            "precision_macro": float(precision_score(yf, yhat, average="macro", zero_division=0)),
            "recall_macro": float(recall_score(yf, yhat, average="macro", zero_division=0)),
        })

    def ms(key):
        vals = [f[key] for f in per_fold if not np.isnan(f[key])]
        if not vals:
            return {"mean": float("nan"), "sd": float("nan")}
        sd = float(np.std(vals, ddof=1)) if len(vals) > 1 else 0.0
        return {"mean": float(np.mean(vals)), "sd": sd}

    return {
        "seed": seed,
        "n_pool": int(len(idx)),
        "per_fold": per_fold,
        "metrics_mean_sd": {k: ms(k) for k in ("auc", "ap", "f1_macro")},
        "bootstrap_ci": bootstrap_ci(yt, st, cfg.bootstrap, seed),
    }


def run_seeds(
    y: np.ndarray, scores: np.ndarray, cfg: Optional[VariabilityConfig] = None,
    out_dir: Optional[str] = None,
) -> Dict:
    cfg = cfg or VariabilityConfig()
    results = [run_one(y, scores, s, cfg) for s in cfg.seeds]
    aucs = [r["metrics_mean_sd"]["auc"]["mean"] for r in results]
    summary = {
        "seeds": list(cfg.seeds),
        "auc_mean": float(np.mean(aucs)),
        "auc_sd": float(np.std(aucs, ddof=1)) if len(aucs) > 1 else 0.0,
        "per_seed": results,
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "summary_variability.json"), "w") as f:
            json.dump(summary, f, indent=1)
        with open(os.path.join(out_dir, "metrics_seeds.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["seed", "auc_mean", "auc_sd", "ap_mean",
                        "auc_ci_lo", "auc_ci_hi"])
            for r in results:
                w.writerow([
                    r["seed"],
                    f"{r['metrics_mean_sd']['auc']['mean']:.6f}",
                    f"{r['metrics_mean_sd']['auc']['sd']:.6f}",
                    f"{r['metrics_mean_sd']['ap']['mean']:.6f}",
                    f"{r['bootstrap_ci']['auc_ci95'][0]:.6f}",
                    f"{r['bootstrap_ci']['auc_ci95'][1]:.6f}",
                ])
    return summary


def load_per_video_csv(path: str):
    """Read a per_video.csv from the streaming harness (gt_label, video_score)."""
    ys, ss = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            ys.append(int(row["gt_label"]))
            ss.append(float(row["video_score"]))
    return np.asarray(ys), np.asarray(ss)
