"""Operating-point selection guards: the inf ROC sentinel must never
escape as a deployable threshold, the O(n) acc/f1 sweep must match the
naive recompute, and a single-class fold must not kill a seed suite."""

import numpy as np

from stdd_tpu.train.metrics import _stats_at_threshold, threshold_from_roc


def test_target_fpr_never_returns_inf():
    """All-negative-scores-above-positives ROC where only the (0,0,inf)
    sentinel meets the FPR budget: the returned threshold must be finite
    and realize 'predict nothing positive'."""
    rng = np.random.RandomState(0)
    y = np.array([0] * 50 + [1] * 50)
    # positives score strictly BELOW negatives → any tpr>0 needs fpr=1
    probs = np.concatenate([rng.uniform(0.6, 1.0, 50), rng.uniform(0.0, 0.4, 50)])
    t, stats = threshold_from_roc(probs, y, target_fpr=0.05)
    assert np.isfinite(t)
    assert stats["fp"] == 0 and stats["tp"] == 0  # realized sentinel


def test_acc_f1_fast_sweep_matches_naive():
    rng = np.random.RandomState(1)
    y = (rng.rand(300) < 0.4).astype(int)
    probs = np.clip(y * 0.3 + rng.rand(300) * 0.7, 0, 1)
    for metric in ("acc", "f1"):
        t, stats = threshold_from_roc(probs, y, metric=metric)
        assert np.isfinite(t)
        # the selected point must achieve the best naive score over the
        # same candidate set
        from sklearn.metrics import roc_curve

        _, _, thr = roc_curve(y, probs)
        naive = max(_stats_at_threshold(probs, y, float(tt))[metric]
                    for tt in thr if np.isfinite(tt))
        assert stats[metric] >= naive - 1e-12, (metric, stats[metric], naive)


def test_variability_single_class_fold_yields_nan_not_crash():
    from stdd_tpu.eval.variability import VariabilityConfig, run_one

    rng = np.random.RandomState(2)
    # 3 fakes, 30 reals, 5 folds -> folds with zero positives are guaranteed
    y = np.array([1] * 3 + [0] * 30)
    scores = rng.rand(33)
    cfg = VariabilityConfig(n_folds=5, fake_per_real=1.0, bootstrap=50)
    out = run_one(y, scores, 0, cfg)
    assert len(out["per_fold"]) == 5
    assert np.isfinite(out["metrics_mean_sd"]["auc"]["mean"]) or all(
        f.get("single_class") for f in out["per_fold"])
