"""Evaluation suite tests: best-checkpoint reports, pool sweeps, seed
variability, own-ROC implementations vs sklearn."""

import json
import os

import numpy as np
import pytest

from stdd_tpu.eval.best import (
    aggregate_videos,
    bootstrap_ci,
    compute_global_metrics,
    evaluate_checkpoint,
    per_tech_accuracy,
    sweep_threshold,
    video_metrics,
)
from stdd_tpu.eval.sweep import pr_auc, roc_auc, sweep_pools
from stdd_tpu.eval.variability import VariabilityConfig, run_seeds


def _scores(n=400, seed=0):
    rng = np.random.RandomState(seed)
    y = (rng.rand(n) > 0.5).astype(int)
    s = np.clip(0.5 + 0.3 * (y - 0.5) + rng.randn(n) * 0.18, 0, 1)
    return y, s


def test_own_roc_matches_sklearn():
    from sklearn.metrics import average_precision_score, roc_auc_score

    y, s = _scores()
    assert roc_auc(y, s) == pytest.approx(roc_auc_score(y, s), abs=1e-9)
    assert pr_auc(y, s) == pytest.approx(average_precision_score(y, s), abs=1e-9)


def test_aggregate_videos_modes():
    meta = [("deepfakes", "v1", "t1")] * 3 + [("REAL", "v2", "t1")] * 3
    y = np.array([1, 1, 1, 0, 0, 0])
    p = np.array([0.9, 0.2, 0.8, 0.1, 0.2, 0.6])
    for mode, v1_score in [("track_mean", np.mean([0.9, 0.2, 0.8])),
                           ("track_median", 0.8)]:
        vids = aggregate_videos(meta, y, p, prob_thresh=0.5, agg_mode=mode)
        assert vids["deepfakes::v1"]["video_score"] == pytest.approx(v1_score)
        assert vids["deepfakes::v1"]["video_pred"] == 1
        assert vids["REAL::v2"]["video_pred"] == 0
    g, pt = video_metrics(aggregate_videos(meta, y, p, 0.5, "track_median"))
    assert g["accuracy"] == 1.0
    assert pt["deepfakes"]["videos"] == 1 and pt["REAL"]["videos"] == 1


def test_sweep_threshold_modes():
    y, s = _scores()
    for mode in ("acc", "youden", "f1"):
        t = sweep_threshold(y, s, mode)
        assert 0.05 <= t <= 0.95
    t_fpr = sweep_threshold(y, s, target_fpr=0.1)
    preds = (s >= t_fpr).astype(int)
    fpr = ((preds == 1) & (y == 0)).sum() / max((y == 0).sum(), 1)
    assert fpr <= 0.12


def test_bootstrap_ci_brackets_point_estimate():
    from sklearn.metrics import roc_auc_score

    y, s = _scores()
    ci = bootstrap_ci(y, s, B=300, seed=1)
    auc = roc_auc_score(y, s)
    lo, hi = ci["auc_ci95"]
    assert lo <= auc <= hi
    assert hi - lo < 0.2


def test_evaluate_checkpoint_report(tmp_path):
    import jax

    from stdd_tpu.models.dual_encoder import DualEncoderAU_LMK

    model = DualEncoderAU_LMK(au_dim=6, lmk_dim=10, d_model=16, depth=1, heads=2)
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 6)), jnp.zeros((1, 4, 10)))["params"]
    rng = np.random.RandomState(0)
    n = 48
    data = {
        "A": rng.randn(n, 4, 6).astype(np.float32),
        "L": rng.randn(n, 4, 10).astype(np.float32),
        "y": (rng.rand(n) > 0.5).astype(np.float32),
    }
    meta = [("deepfakes" if i % 2 else "REAL", f"v{i // 4}", f"t{i // 2}") for i in range(n)]
    report = evaluate_checkpoint(
        model, params, data, meta, threshold=0.5, bootstrap=50,
        out_path=str(tmp_path / "report_median.json"),
    )
    assert "clip_metrics" in report and "video_metrics" in report
    assert os.path.exists(tmp_path / "report_median.json")
    loaded = json.load(open(tmp_path / "report_median.json"))
    assert loaded["agg_mode"] == "track_median"
    assert "per_tech_clip_accuracy" in loaded


def test_pool_sweep(tmp_path):
    rng = np.random.RandomState(0)
    per_video, labels = [], []
    for i in range(30):
        fake = i % 2
        scores = list(np.clip(rng.randn(6) * 0.1 + (0.7 if fake else 0.3), 0, 1))
        per_video.append({1: scores})
        labels.append(fake)
    rows = sweep_pools(per_video, labels, threshold=0.5, out_dir=str(tmp_path))
    assert len(rows) == 8  # all pool methods
    assert all(r["auc_roc"] > 0.95 for r in rows)
    assert (tmp_path / "summary_all.csv").exists()


def test_variability_runner(tmp_path):
    y, s = _scores(300)
    cfg = VariabilityConfig(bootstrap=100, seeds=(42, 43))
    summary = run_seeds(y, s, cfg, out_dir=str(tmp_path))
    assert len(summary["per_seed"]) == 2
    assert 0.5 < summary["auc_mean"] <= 1.0
    assert (tmp_path / "summary_variability.json").exists()
    assert (tmp_path / "metrics_seeds.csv").exists()
