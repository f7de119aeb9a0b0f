"""Scoring/aggregation + quality-gating tests (golden vs reference semantics
and cv2 where applicable)."""

import numpy as np
import pytest

from stdd_tpu.ops.quality import (
    crop_quality,
    frame_quality_weight,
    half_res_area,
    variance_of_laplacian_batch,
    variance_of_laplacian_np,
)
from stdd_tpu.runtime.scoring import (
    HysteresisState,
    POOL_METHODS,
    aggregate_video,
    decide_meeting_fake,
    pool_track,
    score_with_stability,
)


# -- pooling: golden values mirror TEST2.py:636 ------------------------------

def _ref_pool(scores, method, topk_ratio=0.2, percentile_p=80.0, trim_ratio=0.2):
    """Inline re-derivation of the reference pooling math for cross-checking."""
    s = np.asarray(scores, float)
    if method == "mean":
        return np.mean(s)
    if method == "median":
        return np.median(s)
    if method == "logit_median":
        se = np.clip(s, 1e-6, 1 - 1e-6)
        return 1 / (1 + np.exp(-np.median(np.log(se / (1 - se)))))
    if method == "topk":
        k = max(1, int(np.ceil(topk_ratio * s.size)))
        return np.mean(np.sort(s)[-k:])
    if method == "topk_median":
        k = max(1, int(np.ceil(topk_ratio * s.size)))
        return np.median(np.sort(s)[-k:])
    if method == "percentile":
        return np.percentile(s, percentile_p)
    if method == "trimmed_mean":
        ss = np.sort(s)
        n = ss.size
        a = int(n * trim_ratio)
        return np.mean(ss[a : max(a + 1, n - a)])
    if method == "adaptive":
        iqr = np.percentile(s, 75) - np.percentile(s, 25)
        if iqr < 0.15:
            return np.percentile(s, percentile_p)
        se = np.clip(s, 1e-6, 1 - 1e-6)
        return 1 / (1 + np.exp(-np.median(np.log(se / (1 - se)))))
    raise ValueError(method)


@pytest.mark.parametrize("method", POOL_METHODS)
def test_pool_methods(method):
    rng = np.random.RandomState(0)
    for _ in range(3):
        s = rng.uniform(0, 1, rng.randint(1, 40))
        np.testing.assert_allclose(pool_track(s, method), _ref_pool(s, method), rtol=1e-12)
    assert pool_track([], method) == 0.0


def test_stability_penalty():
    stable = [0.9, 0.91, 0.9, 0.89]
    assert score_with_stability(stable, 0.9) == 0.9
    jumpy = [0.1, 0.9, 0.05, 0.95, 0.2]
    base = 0.6
    iqr = np.percentile(jumpy, 85) - np.percentile(jumpy, 25)
    assert score_with_stability(jumpy, base) == pytest.approx(base * 0.85 ** (iqr / 0.25))
    # high median is exempt even when jumpy
    high = [0.99, 0.5, 0.99, 0.99, 0.98]
    if np.median(high) >= 0.85:
        assert score_with_stability(high, 0.9) == 0.9


def test_aggregate_video_or_and_max():
    v = aggregate_video(
        {1: [0.1, 0.15, 0.2], 2: [0.8, 0.85, 0.9]}, threshold=0.5, pool_method="median"
    )
    assert v.video_fake and v.per_person_labels == {1: 0, 2: 1}
    assert v.video_score == pytest.approx(0.85)  # max of raw pooled

    v2 = aggregate_video({1: [0.1, 0.2]}, threshold=0.5)
    assert not v2.video_fake and v2.video_score == pytest.approx(0.15)


def test_aggregate_video_qa_override():
    # low-quality video: quantile rule can flip a borderline track
    scores = {1: [0.3, 0.4, 0.92, 0.96, 0.3]}
    v = aggregate_video(scores, threshold=0.99, low_quality=True, qa_q75_thr=0.9)
    assert v.per_person_labels[1] == 1  # q75 >= 0.9 triggers QA rule
    v = aggregate_video(scores, threshold=0.99, low_quality=False)
    assert v.per_person_labels[1] == 0


def test_hysteresis_flipflop():
    h = HysteresisState(t_high=0.75, t_low=0.65, window=5)
    # climb to fake
    states = [h.update(1, s) for s in [0.8, 0.8, 0.8]]
    assert states[-1] is True
    # needs to drop BELOW t_low to flip back
    assert h.update(1, 0.7) is True  # median still >= 0.65
    for s in [0.1, 0.1, 0.1, 0.1, 0.1]:
        state = h.update(1, s)
    assert state is False


def test_meeting_decision():
    scores = {1: [0.5] * 20, 2: [0.9] * 20}
    frames = {1: 200, 2: 100}
    # track 2 is hot but hasn't enough frames
    assert not decide_meeting_fake(scores, frames, threshold=0.8, min_frames=128)
    frames[2] = 130
    assert decide_meeting_fake(scores, frames, threshold=0.8, min_frames=128)


# -- quality ------------------------------------------------------------------

def test_laplacian_variance_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 56, 3), np.uint8)
    ref = cv2.Laplacian(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY), cv2.CV_64F).var()
    got_np = variance_of_laplacian_np(img)
    assert abs(got_np - ref) / ref < 5e-3
    got_dev = float(variance_of_laplacian_batch(img[None])[0])
    assert abs(got_dev - ref) / ref < 5e-3


def test_crop_quality_matches_reference_fn():
    """Golden vs af_realtime.py:262's math (half-res INTER_AREA + product)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)

    def ref_quality(crop_rgb, hard_s=32, soft_s=64, hard_l=10.0, soft_l=60.0):
        h, w = crop_rgb.shape[:2]
        min_side = min(h, w)
        small = cv2.resize(crop_rgb, (max(1, w // 2), max(1, h // 2)),
                           interpolation=cv2.INTER_AREA)
        lap = cv2.Laplacian(cv2.cvtColor(small, cv2.COLOR_RGB2GRAY), cv2.CV_64F).var()
        if min_side < hard_s or lap < hard_l:
            return 0.0, min_side, lap
        size_w = 1.0 if min_side >= soft_s else max(0.0, (min_side - hard_s) / max(1.0, soft_s - hard_s))
        lap_w = 1.0 if lap >= soft_l else max(0.0, (lap - hard_l) / max(1e-6, soft_l - hard_l))
        return size_w * lap_w, min_side, lap

    for shape in [(80, 90), (40, 200), (20, 20)]:
        crop = rng.randint(0, 255, shape + (3,), np.uint8)
        w_ref, ms_ref, lap_ref = ref_quality(crop)
        w, ms, lap = crop_quality(crop)
        assert ms == ms_ref
        assert abs(lap - lap_ref) / max(lap_ref, 1e-6) < 2e-2
        assert abs(w - w_ref) < 2e-2


def test_quality_weight_hard_gates():
    assert frame_quality_weight(10, 100.0) == 0.0   # too small
    assert frame_quality_weight(100, 5.0) == 0.0    # too blurry
    assert frame_quality_weight(100, 100.0) == 1.0  # comfortably above soft
    mid = frame_quality_weight(48, 35.0)
    assert 0.0 < mid < 1.0
