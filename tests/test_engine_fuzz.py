"""Engine robustness under adversarial detector behavior: flickering faces,
empty frames, degenerate/out-of-frame boxes, track churn. The engine must
never crash, must GC dead track state, and must keep scoring live tracks."""

import numpy as np

import jax.numpy as jnp

from stdd_tpu.config import PipelineConfig
from stdd_tpu.ops.align import STD_POINTS_256
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.runtime.engine import StreamingEngine
from tests.test_engine import SMALL_CFG


def _row(x, y, w, h, conf=0.9):
    lm = (STD_POINTS_256 * (w / 256.0) + np.array([x, y])).reshape(-1)
    return [x, y, w, h, *lm, conf]


def make_fuzz_detector(seed=0):
    rng = np.random.RandomState(seed)
    state = {"f": 0}

    def detect(frame_bgr):
        f = state["f"]
        state["f"] += 1
        H, W = frame_bgr.shape[:2]
        r = rng.rand()
        if r < 0.15:
            return np.empty((0, 15), np.float32)          # nothing detected
        rows = []
        # one mostly-stable face so clips actually fill
        if f % 7 != 0:                                    # flicker every 7th
            rows.append(_row(30 + 0.5 * f, 40 + 0.2 * f, 60, 70))
        if r < 0.3:                                       # degenerate box
            rows.append(_row(W - 2, H - 2, 1, 1, 0.95))
        if r < 0.45:                                      # out-of-frame box
            rows.append(_row(W + 50, H + 80, 40, 40, 0.9))
        if r < 0.6:                                       # tiny low-conf
            rows.append(_row(rng.randint(0, W), rng.randint(0, H), 5, 5, 0.61))
        if r < 0.2:                                       # transient face
            rows.append(_row(200 + 10 * (f % 3), 100, 50, 55, 0.9))
        return np.asarray(rows, np.float32)

    return detect


def test_engine_survives_fuzzed_detections_and_gcs_state():
    pipe = PipelineConfig(clip_size=8, imsize=64, stride=4, detect_every=2,
                          batch_clips=2, min_face_side=8)
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, make_fuzz_detector(), cfg=pipe, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False, drop_after=12,
    )
    frame = np.random.RandomState(1).randint(0, 255, (240, 320, 3), np.uint8)
    scored = []
    for _ in range(120):
        scored += eng.step(frame)
    scored += eng.flush()
    assert scored, "stable track must produce scores despite the noise"
    for _, p in scored:
        assert np.isfinite(p) and 0.0 <= p <= 1.0
    # churned tracks must be GC'd: live per-track buffers bounded
    assert len(eng.buffers) <= 8
    assert len(eng.last_seen) <= 8
    verdict = eng.finish()
    assert verdict.raw_scores


def test_engine_all_empty_detections_is_clean():
    pipe = PipelineConfig(clip_size=8, imsize=64, stride=4, detect_every=2,
                          batch_clips=2, min_face_side=8)
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, lambda f: np.empty((0, 15), np.float32), cfg=pipe,
        crop_buffer=160, q_weighting=False, q_lap_hard=0.0,
    )
    frame = np.zeros((240, 320, 3), np.uint8)
    for _ in range(30):
        assert eng.step(frame) == []
    assert eng.flush() == []
    verdict = eng.finish()
    assert not verdict.raw_scores
    assert not verdict.video_fake


def test_ring_engine_survives_fuzz_with_crowd_overflow():
    """Ring mode under churn AND ring-budget pressure: flickering faces,
    degenerate boxes, more simultaneous tracks than max_rings (overflow
    tracks take the host-packed path, so dispatch batches can mix window
    and packed clips). Must never crash, must keep scoring, must GC ring
    state with dead tracks."""
    rng = np.random.RandomState(7)
    state = {"f": 0}

    def detect(frame_bgr):
        f = state["f"]
        state["f"] += 1
        rows = []
        # three stable faces (> max_rings=2) so overflow is permanent
        for k in range(3):
            if f % (11 + k) != 0:                 # each flickers occasionally
                rows.append(_row(20 + 90 * k + 0.4 * f, 40 + 0.2 * f, 55, 62))
        if rng.rand() < 0.3:                      # transient churn
            rows.append(_row(30 + 15 * (f % 4), 160, 48, 50, 0.9))
        if rng.rand() < 0.2:                      # degenerate
            rows.append(_row(318, 238, 1, 1, 0.95))
        return np.asarray(rows, np.float32) if rows else np.empty((0, 15), np.float32)

    pipe = PipelineConfig(clip_size=8, imsize=64, stride=4, detect_every=2,
                          batch_clips=2, min_face_side=8)
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, detect, cfg=pipe, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False, drop_after=12,
        device_resident=True, max_rings=2,
    )
    frame = np.random.RandomState(2).randint(0, 255, (240, 320, 3), np.uint8)
    scored = []
    for _ in range(120):
        scored += eng.step(frame)
    scored += eng.flush()
    assert len(eng.rings) <= 2
    # the three stable faces all scored despite only two rings
    assert len({t for t, _ in scored}) >= 3, scored
    assert all(0.0 <= p <= 1.0 for _, p in scored)
    # GC: transient tracks' ring/buffer state does not accumulate
    assert len(eng.buffers) <= 6 and len(eng.since_emit) <= 6
