"""TRUE reference oracles for the TEST2 scoring/aggregation math.

Round-2 VERDICT #4: tests/test_scoring.py cross-checks against an inline
re-derivation, which could encode the same misreading on both sides. Here
the comparison target is the reference's OWN code: ``_pool_track`` and
``score_with_stability`` materialized from ``VideoRunner.run``'s code
objects, and the end-of-video aggregation exec'd from the TEST2.py source
slice (see tests/oracles/ref_scoring.py). Reference: TEST2.py:627,:636,
:699-766."""

import types

import numpy as np
import pytest

from stdd_tpu.runtime.scoring import (
    POOL_METHODS,
    aggregate_video,
    pool_track,
    score_with_stability,
)

ref = pytest.importorskip("tests.oracles.ref_scoring")


def _score_sets(n_sets=40, seed=0):
    """Randomized clip-score series covering the interesting regimes:
    tight/wide spreads (adaptive's IQR branch), saturated-high medians
    (stability's 0.85 gate), tiny and large sizes (topk ceil, trimmed
    bounds)."""
    rng = np.random.RandomState(seed)
    sets = []
    for i in range(n_sets):
        n = int(rng.choice([1, 2, 3, 5, 8, 13, 40, 200]))
        kind = i % 5
        if kind == 0:
            s = rng.uniform(0, 1, n)
        elif kind == 1:
            s = np.clip(rng.normal(0.9, 0.03, n), 0, 1)      # tight high
        elif kind == 2:
            s = np.clip(rng.normal(0.5, 0.3, n), 0, 1)       # wide
        elif kind == 3:
            s = np.clip(rng.beta(0.3, 0.3, n), 0, 1)         # bimodal
        else:
            s = np.clip(rng.uniform(0.8, 1.0, n), 0, 1)      # saturated
        sets.append(s)
    # boundary values the clip() in logit pooling must handle
    sets.append(np.array([0.0, 1.0, 0.5]))
    sets.append(np.array([1.0]))
    sets.append(np.array([0.0]))
    return sets


@pytest.mark.parametrize("method", POOL_METHODS)
def test_pool_track_matches_reference_bytecode(method):
    ref_pool, _ = ref.reference_pool_fns()
    for s in _score_sets():
        for tk, pp, tr in [(0.2, 80.0, 0.2), (0.5, 95.0, 0.4), (0.01, 10.0, 0.0)]:
            got = pool_track(s, method, topk_ratio=tk, percentile_p=pp,
                             trim_ratio=tr)
            want = ref_pool(s, method=method, topk_ratio=tk, percentile_p=pp,
                            trim_ratio=tr)
            assert got == pytest.approx(want, abs=1e-12), (method, s[:8], tk, pp, tr)


def test_pool_track_unknown_method_falls_back_to_median():
    ref_pool, _ = ref.reference_pool_fns()
    s = np.array([0.1, 0.7, 0.4, 0.9])
    assert pool_track(s, "not_a_method") == ref_pool(
        s, method="not_a_method", topk_ratio=0.2, percentile_p=80.0,
        trim_ratio=0.2)


def test_empty_scores_match_reference():
    ref_pool, ref_stab = ref.reference_pool_fns()
    assert pool_track([], "median") == ref_pool(
        [], method="median", topk_ratio=0.2, percentile_p=80.0, trim_ratio=0.2)
    assert score_with_stability([], 0.7) == ref_stab([], 0.7)


def test_score_with_stability_matches_reference_bytecode():
    _, ref_stab = ref.reference_pool_fns()
    for s in _score_sets(seed=1):
        base = float(np.median(s))
        assert score_with_stability(s, base) == pytest.approx(
            ref_stab(s, base), abs=1e-12), s[:8]


def _args(pool_method="median", optimal_threshold=0.5, min_clips=1,
          disable_penalty=False, qa_q75_thr=0.9, qa_q90_thr=0.95,
          topk_ratio=0.2, percentile_p=80.0, trim_ratio=0.2):
    return types.SimpleNamespace(
        pool_method=pool_method, optimal_threshold=optimal_threshold,
        min_clips=min_clips, disable_penalty=disable_penalty,
        qa_q75_thr=qa_q75_thr, qa_q90_thr=qa_q90_thr, topk_ratio=topk_ratio,
        percentile_p=percentile_p, trim_ratio=trim_ratio)


def _random_tracks(rng, n_tracks):
    return {
        tid: list(np.clip(rng.normal(rng.uniform(0.2, 0.95),
                                     rng.uniform(0.02, 0.3),
                                     int(rng.choice([1, 2, 4, 9, 25]))), 0, 1))
        for tid in range(n_tracks)
    }


@pytest.mark.parametrize("low_quality", [False, True])
@pytest.mark.parametrize("pool_method", ["median", "adaptive", "topk"])
def test_aggregation_matches_reference_source(low_quality, pool_method, capsys):
    """Full end-of-video decision vs the exec'd reference source segment:
    per-track raw/penalized scores, std labels, the QA q75/q90 override on
    low-quality videos, the OR verdict, and max-raw video score."""
    rng = np.random.RandomState(7 if low_quality else 8)
    for trial in range(6):
        tracks = _random_tracks(rng, int(rng.randint(1, 6)))
        args = _args(pool_method=pool_method,
                     optimal_threshold=float(rng.uniform(0.3, 0.8)),
                     min_clips=int(rng.choice([1, 2, 3])),
                     disable_penalty=bool(rng.randint(2)),
                     qa_q75_thr=float(rng.uniform(0.6, 0.95)),
                     qa_q90_thr=float(rng.uniform(0.7, 0.99)))
        want = ref.reference_aggregate(tracks, args, low_quality)
        capsys.readouterr()   # swallow the reference's [SCORE] prints
        got = aggregate_video(
            tracks, threshold=args.optimal_threshold,
            pool_method=pool_method, topk_ratio=args.topk_ratio,
            percentile_p=args.percentile_p, trim_ratio=args.trim_ratio,
            min_clips=args.min_clips, disable_penalty=args.disable_penalty,
            low_quality=low_quality, qa_q75_thr=args.qa_q75_thr,
            qa_q90_thr=args.qa_q90_thr)
        assert set(got.raw_scores) == set(want["raw_scores"])
        for tid in want["raw_scores"]:
            assert got.raw_scores[tid] == pytest.approx(
                want["raw_scores"][tid], abs=1e-12)
            assert got.per_person_scores[tid] == pytest.approx(
                want["per_person"][tid], abs=1e-12)
        assert got.per_person_labels == want["per_person_labels"]
        assert got.video_fake == want["video_fake"]
        assert got.video_score == pytest.approx(want["video_score"], abs=1e-12)


def test_aggregation_min_clips_filter_matches_reference():
    """min_clips filters a track out of per_person but the reference still
    keeps it OUT of raw_scores too (the continue happens before both) —
    verify our behavior matches on a crafted boundary set."""
    tracks = {0: [0.9], 1: [0.2, 0.3, 0.95], 2: []}
    args = _args(min_clips=2, optimal_threshold=0.5)
    want = ref.reference_aggregate(tracks, args, low_quality=False)
    got = aggregate_video(tracks, threshold=0.5, min_clips=2)
    assert set(got.raw_scores) == set(want["raw_scores"]) == {1}
    assert got.video_fake == want["video_fake"]
    assert got.video_score == pytest.approx(want["video_score"])
