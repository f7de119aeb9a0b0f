"""Device-resident streaming rings: per-frame HBM upload + on-device
window gathers (VERDICT r1 #2). On CPU the 'device' is host memory, but the
exact same jitted push/gather/score programs run, so correctness of the
ring path — ordering, wraparound, per-frame scale folding, LRU eviction,
latency accounting — is fully exercised without a TPU."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig, PipelineConfig
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.runtime.engine import StreamingEngine
from stdd_tpu.runtime.ring import DeviceRing, RingKernels, RingUploader
from tests.test_engine import PIPE, SMALL_CFG, make_fake_detector, _frames


def test_ring_wraparound_order():
    k = RingKernels(R=8, S=16, yuv420=False)
    ring = DeviceRing(k)
    for i in range(13):   # wraps past R=8
        crop = np.full((12, 10, 3), i, np.uint8)
        ring.push(crop, np.array([i, i, i + 10.0, i + 12.0]),
                  np.full((5, 2), float(i)))
    dev, boxes, lm5, scale = ring.window(6)
    w = np.asarray(dev)
    # last 6 pushes are 7..12, oldest first; crop content sits in the
    # zero-padded top-left corner of each slot
    np.testing.assert_array_equal(w[:, 0, 0, 0], np.arange(7, 13))
    np.testing.assert_allclose(boxes[:, 0], np.arange(7, 13))
    np.testing.assert_allclose(lm5[:, 0, 0], np.arange(7, 13))
    assert (scale == 1.0).all()

    with pytest.raises(ValueError):
        DeviceRing(k).window(1)


def test_ring_uploader_background_push():
    """Pushes through the background uploader must produce the same device
    ring state as synchronous pushes — window() syncs before gathering, so
    a gather can never miss an in-flight frame."""
    k = RingKernels(R=8, S=16, yuv420=False)
    up = RingUploader()
    try:
        ring = DeviceRing(k, uploader=up)
        sync_ring = DeviceRing(k)
        for i in range(13):
            crop = np.full((12, 10, 3), i, np.uint8)
            box = np.array([i, i, i + 10.0, i + 12.0])
            lm = np.full((5, 2), float(i))
            ring.push(crop, box, lm)
            sync_ring.push(crop, box, lm)
        dev, boxes, lm5, scale = ring.window(6)
        dev2, boxes2, lm52, scale2 = sync_ring.window(6)
        np.testing.assert_array_equal(np.asarray(dev), np.asarray(dev2))
        np.testing.assert_allclose(boxes, boxes2)
    finally:
        up.close()


def test_ring_uploader_surfaces_errors():
    k = RingKernels(R=4, S=16, yuv420=False)
    up = RingUploader()
    try:
        ring = DeviceRing(k, uploader=up)
        ring.push(np.full((10, 10, 3), 1, np.uint8),
                  np.array([0.0, 0, 10, 10]), np.zeros((5, 2)))
        # a malformed slot group (wrong shape) makes the jitted push fail on
        # the worker; the error must surface at the next sync, not vanish
        up.submit(ring, np.zeros((1, 3, 3), np.uint8), 1, 1)
        with pytest.raises(RuntimeError):
            up.sync(ring)
        assert ring.broken   # its HBM state is missing a frame
    finally:
        up.close()


def test_ring_uploader_error_is_per_ring():
    """Stream A's failed push must surface at A's sync only: B's sync must
    pass clean, and A must be flagged broken (one shared error slot would
    crash B while A went on scoring stale pixels silently)."""
    k = RingKernels(R=4, S=16, yuv420=False)
    up = RingUploader()
    try:
        ring_a = DeviceRing(k, uploader=up)
        ring_b = DeviceRing(k, uploader=up)
        for r in (ring_a, ring_b):
            r.push(np.full((10, 10, 3), 1, np.uint8),
                   np.array([0.0, 0, 10, 10]), np.zeros((5, 2)))
            r.flush_staged()
        up.submit(ring_a, np.zeros((1, 3, 3), np.uint8), 1, 1)  # bad shape
        up.sync(ring_b)                    # unaffected peer
        assert not ring_b.broken
        with pytest.raises(RuntimeError):
            up.sync(ring_a)
        assert ring_a.broken
        up.sync(ring_a)                    # error was consumed, not sticky
        # bookkeeping is released on forget (id() reuse must not collide)
        ring_a.close()
        assert id(ring_a) not in up._pending and id(ring_a) not in up._errs
    finally:
        up.close()


def test_ring_yuv420_slot_shape():
    k = RingKernels(R=4, S=16, yuv420=True)
    ring = DeviceRing(k)
    ring.push(np.full((10, 10, 3), 200, np.uint8),
              np.array([0.0, 0, 10, 10]), np.zeros((5, 2)))
    assert ring.ring.shape == (4, 24, 16)


def _run_engine(device_resident, n=40, crop_buffer=160, n_faces=1):
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, make_fake_detector(n_faces), cfg=PIPE, crop_buffer=crop_buffer,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
        device_resident=device_resident,
    )
    for fr in _frames(n):
        eng.step(fr)
    eng.flush()
    return eng


def test_ring_engine_matches_packed_engine():
    """Same stream through the ring path and the host-packed path must
    produce (nearly) identical per-track clip scores — the ring only moves
    WHERE pixels live, not what is computed. Tolerance covers different
    XLA executables (stack+scaled-warp vs packed) fusing differently."""
    packed = _run_engine(device_resident=False)
    ring = _run_engine(device_resident=True)
    assert set(packed.track_clip_scores) == set(ring.track_clip_scores)
    for tid in packed.track_clip_scores:
        a, b = packed.track_clip_scores[tid], ring.track_clip_scores[tid]
        assert len(a) == len(b), (tid, a, b)
        np.testing.assert_allclose(a, b, atol=2e-3)
    assert len(ring.clip_latencies) == sum(
        len(v) for v in ring.track_clip_scores.values()
    )


def test_ring_engine_matches_packed_with_downscale():
    """crop_buffer smaller than the face crop forces per-frame pack scales
    < 1; the scale-folded warp must still reproduce the packed result."""
    packed = _run_engine(device_resident=False, crop_buffer=64)
    ring = _run_engine(device_resident=True, crop_buffer=64)
    for tid in packed.track_clip_scores:
        np.testing.assert_allclose(
            packed.track_clip_scores[tid], ring.track_clip_scores[tid],
            atol=5e-3,
        )


def test_ring_lru_eviction():
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, make_fake_detector(3), cfg=PIPE, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
        device_resident=True, max_rings=2,
    )
    for fr in _frames(6):
        eng.step(fr)
    assert len(eng.rings) <= 2
    eng.flush()


def test_ring_crowd_overflow_no_thrash():
    """More live faces than max_rings: ringed tracks keep their rings
    stable across frames (no LRU cascade), overflow tracks fall back to the
    host-packed path — and EVERY track still produces clip scores."""
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, make_fake_detector(3), cfg=PIPE, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
        device_resident=True, max_rings=2,
    )
    ring_ids_at = {}
    for i, fr in enumerate(_frames(20)):
        eng.step(fr)
        if i in (10, 19):
            ring_ids_at[i] = {tid: id(r) for tid, r in eng.rings.items()}
    eng.flush()
    # the two ringed tracks kept the SAME ring objects (no re-creation churn)
    assert ring_ids_at[10] == ring_ids_at[19], ring_ids_at
    assert len(eng.rings) == 2
    # all three faces scored: two through rings, one through packed fallback
    assert len(eng.track_clip_scores) == 3, dict(eng.track_clip_scores)
    for tid, scores in eng.track_clip_scores.items():
        assert scores, (tid, dict(eng.track_clip_scores))


def test_ring_broken_recovers():
    """A ring whose upload failed (broken flag) is dropped and re-created on
    the next step; the stream keeps scoring afterwards."""
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, make_fake_detector(1), cfg=PIPE, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
        device_resident=True,
    )
    frames = list(_frames(40))
    for fr in frames[:12]:
        eng.step(fr)
    eng.flush()
    n_before = sum(len(v) for v in eng.track_clip_scores.values())
    assert n_before > 0
    (tid, old_ring), = eng.rings.items()
    old_ring.broken = True                 # simulate a failed H2D push
    for fr in frames[12:]:
        eng.step(fr)
    eng.flush()
    assert eng.rings[tid] is not old_ring  # dropped and re-created
    assert not eng.rings[tid].broken
    n_after = sum(len(v) for v in eng.track_clip_scores.values())
    assert n_after > n_before              # scoring resumed on the new ring


def _scripted_detector(schedule):
    """Detector driven by a {tid_slot: (start, end)} presence schedule; each
    slot moves on its own deterministic path so ByteTrack keeps identities
    stable across absences (track_buffer is large)."""
    state = {"f": 0}

    def detect(frame_bgr):
        f = state["f"]
        state["f"] += 1
        rows = []
        for k, (s, e) in enumerate(schedule):
            if not (s <= f < e):
                continue
            x = 25 + 45 * k + 1.0 * f
            y = 35 + 25 * k + 0.4 * f
            w, h = 60.0, 70.0
            lm = (STD_POINTS_256 * (w / 256.0) + np.array([x, y])).reshape(-1)
            rows.append([x, y, w, h, *lm, 0.92])
        return np.asarray(rows, np.float32) if rows else np.empty((0, 15),
                                                                  np.float32)

    return detect


from stdd_tpu.ops.align import STD_POINTS_256  # noqa: E402  (helper above)


def _run_scripted(schedule, device_resident, n, max_rings=3):
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, _scripted_detector(schedule), cfg=PIPE, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
        device_resident=device_resident, max_rings=max_rings,
        drop_after=10 ** 6,   # churn comes from the schedule, not GC
    )
    evicted = set()
    if device_resident:
        orig = eng._drop_ring

        def spy(tid):
            if tid in eng.rings:
                evicted.add(tid)
            orig(tid)

        eng._drop_ring = spy
    peak_rings = 0
    for fr in _frames(n):
        eng.step(fr)
        if device_resident:
            peak_rings = max(peak_rings, len(eng.rings))
    eng.flush()
    return eng, evicted, peak_rings


def test_ring_eviction_boundary_matches_packed():
    """HBM-budget boundary (VERDICT r2 #9): a churning crowd that triggers a
    real eviction (a face leaves, a newcomer takes its ring slot) and a real
    overflow (the face returns into a full live set). The ring budget is
    never exceeded, and every track whose ring SURVIVED the churn produces
    exactly the packed path's scores."""
    # slots: 0,1 always live; 2 leaves at 16; 3 enters at 20 (evicts 2's
    # idle ring); 2 returns at 28 into 3 live rings → packed fallback
    schedule = [(0, 60), (0, 60), (0, 16), (20, 60), (28, 60)]
    n = 60
    packed, _, _ = _run_scripted(schedule, device_resident=False, n=n)
    ring, evicted, peak = _run_scripted(schedule, device_resident=True, n=n)

    assert peak <= 3                      # the HBM budget held
    assert evicted, "schedule must actually trigger an eviction"
    assert set(packed.track_clip_scores) == set(ring.track_clip_scores)
    for tid in packed.track_clip_scores:
        if tid in evicted:
            # eviction legitimately resets windowing; scores still valid
            assert all(0.0 <= p <= 1.0 for p in ring.track_clip_scores[tid])
            continue
        np.testing.assert_allclose(
            packed.track_clip_scores[tid], ring.track_clip_scores[tid],
            atol=2e-3, err_msg=f"surviving track {tid} diverged from packed")


@pytest.mark.parametrize("seed", [0, 1])
def test_ring_eviction_fuzz_equivalence(seed):
    """Randomized churn schedules at the eviction boundary: invariants are
    budget-respect, liveness (every track scores), and packed-equivalence
    for tracks whose rings survived."""
    rng = np.random.RandomState(seed)
    n = 48
    schedule = [(0, n), (0, n)]                       # two anchors
    for _ in range(3):                                # three churners
        s = int(rng.randint(0, n - 16))
        e = int(s + rng.randint(12, n - s + 1))
        schedule.append((s, e))
    packed, _, _ = _run_scripted(schedule, device_resident=False, n=n,
                                 max_rings=2)
    ring, evicted, peak = _run_scripted(schedule, device_resident=True, n=n,
                                        max_rings=2)
    assert peak <= 2
    assert set(packed.track_clip_scores) == set(ring.track_clip_scores)
    for tid, pscores in packed.track_clip_scores.items():
        rscores = ring.track_clip_scores[tid]
        assert all(0.0 <= p <= 1.0 for p in rscores)
        if tid not in evicted and len(pscores) == len(rscores):
            np.testing.assert_allclose(pscores, rscores, atol=2e-3)


def test_ring_multiface_and_yuv420():
    scorer = ClipScorer.random_init(
        cfg=SMALL_CFG, dtype=jnp.float32, upload_format="yuv420"
    )
    eng = StreamingEngine(
        scorer, make_fake_detector(2), cfg=PIPE, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
        device_resident=True,
    )
    for fr in _frames(30):
        eng.step(fr)
    eng.flush()
    assert len(eng.track_clip_scores) == 2
    for scores in eng.track_clip_scores.values():
        assert scores and all(0.0 <= p <= 1.0 for p in scores)


def test_ring_window_padded_short_track():
    """window_padded on a young ring: last k frames oldest-first, then the
    newest frame repeated to T (TEST2.py:358-363 short-window padding)."""
    k = RingKernels(R=8, S=16, yuv420=False)
    ring = DeviceRing(k)
    for i in range(3):
        crop = np.full((12, 10, 3), i + 1, np.uint8)
        ring.push(crop, np.array([i, i, i + 10.0, i + 12.0]),
                  np.full((5, 2), float(i)))
    dev, boxes, lm5, scale = ring.window_padded(6)
    w = np.asarray(dev)
    np.testing.assert_array_equal(w[:, 0, 0, 0], [1, 2, 3, 3, 3, 3])
    np.testing.assert_allclose(boxes[:, 0], [0, 1, 2, 2, 2, 2])
    np.testing.assert_allclose(lm5[:, 0, 0], [0, 1, 2, 2, 2, 2])
    assert (scale == 1.0).all()

    # with count >= T it degenerates to the regular window
    for i in range(3, 9):
        ring.push(np.full((12, 10, 3), i + 1, np.uint8),
                  np.array([i, i, i + 10.0, i + 12.0]),
                  np.full((5, 2), float(i)))
    devp, bp, _, _ = ring.window_padded(6)
    devf, bf, _, _ = ring.window(6)
    np.testing.assert_array_equal(np.asarray(devp), np.asarray(devf))
    np.testing.assert_allclose(bp, bf)

    with pytest.raises(ValueError):
        DeviceRing(k).window_padded(4)


def test_ring_early_window_matches_packed_engine():
    """The provisional sub-stride window must score identically through the
    ring path and the host-packed path (both pad with the newest frame)."""
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    kw = dict(cfg=PIPE, crop_buffer=160, q_lap_hard=0.0, q_lap_soft=0.0,
              q_weighting=False, early_window_frac=0.5)
    eng_r = StreamingEngine(scorer, make_fake_detector(1),
                            device_resident=True, **kw)
    eng_p = StreamingEngine(scorer, make_fake_detector(1),
                            device_resident=False, **kw)
    # clip 8, early frac 0.5 → provisional window after 4 frames
    for fr in _frames(5):
        eng_r.step(fr)
        eng_p.step(fr)
    sr = eng_r.flush()
    sp = eng_p.flush()
    assert len(sr) == 1 and len(sp) == 1
    assert sr[0][0] == sp[0][0]
    np.testing.assert_allclose(sr[0][1], sp[0][1], atol=2e-3)
