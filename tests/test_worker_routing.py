"""Ring-mode scores are materialized and routed on the dispatch lane itself.

Round-4 latency fix: harvesting only from the stepping thread quantized
window latency to the step cadence and paid a separate D2H fetch round trip
through the relay (~27 ms measured, BENCH_r04 decomposition). In
device-resident mode the lane thread now blocks on the (kilobyte) result
right after shipping and routes it via a non-blocking harvest — so a scored
window reaches its owner's ready list without ANY further step() call.
"""

import numpy as np

import jax.numpy as jnp

from stdd_tpu.config import PipelineConfig
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.runtime.engine import StreamingEngine
from tests.test_engine import SMALL_CFG
from tests.test_engine_fuzz import _row


def test_ring_worker_routes_scores_without_a_step_tick():
    state = {"f": 0}

    def detect(frame_bgr):
        f = state["f"]
        state["f"] += 1
        return np.asarray([_row(30 + 0.3 * f, 40, 60, 70)], np.float32)

    pipe = PipelineConfig(clip_size=8, imsize=64, stride=4, detect_every=2,
                          batch_clips=2, min_face_side=8)
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, detect, cfg=pipe, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
        device_resident=True,
    )
    frame = np.random.RandomState(1).randint(0, 255, (240, 320, 3), np.uint8)
    try:
        # step ONLY until the first batch has been handed to a lane
        for _ in range(80):
            eng.step(frame)
            if eng._group._next_seq > 0:
                break
        assert eng._group._next_seq > 0, "no batch was ever dispatched"
        # no more step() calls: the lane alone must finish the job
        eng._group._dispatch_q.join()
        # routing happens on the lane BEFORE task_done, so after join the
        # in-flight list is drained and the score has reached the owner
        assert eng._group.inflight == []
        assert eng._group._next_harvest_seq == eng._group._next_seq
        scored = eng._take_ready()
        assert scored and all(0.0 <= p <= 1.0 for _, p in scored)
        assert any(v for v in eng.track_clip_scores.values())
    finally:
        eng.close()


def test_mixed_ring_and_packed_batch_stays_async(monkeypatch):
    """ADVICE r4 #1: with max_rings exhausted, a crowd-overflow track ships
    host-packed inside a ring-mode batch. The lane must NOT eagerly
    materialize such a MIXED batch (that would block an upload lane on a
    multi-second packed H2D through the relay) — it stays on the async
    harvest path, and the normal flush still routes every score."""
    state = {"f": 0}

    def detect(frame_bgr):
        f = state["f"]
        state["f"] += 1
        # two faces, smoothly drifting, well separated
        return np.asarray([_row(30 + 0.3 * f, 40, 60, 70),
                           _row(180 + 0.3 * f, 40, 60, 70)], np.float32)

    pipe = PipelineConfig(clip_size=8, imsize=64, stride=4, detect_every=2,
                          batch_clips=2, min_face_side=8)
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, detect, cfg=pipe, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
        device_resident=True, max_rings=1,   # second face must go packed
    )
    group = eng._group
    mixed_seen = []
    orig = group._score_batch

    def spy(batch):
        mixed_seen.append(sorted({c.window is not None for c in batch}))
        return orig(batch)

    monkeypatch.setattr(group, "_score_batch", spy)
    frame = np.random.RandomState(1).randint(0, 255, (240, 320, 3), np.uint8)
    try:
        for _ in range(60):
            eng.step(frame)
            if group._next_seq > 0:
                break
        assert group._next_seq > 0, "no batch was ever dispatched"
        group._dispatch_q.join()
        assert any(kinds == [False, True] for kinds in mixed_seen), (
            f"fixture failed to produce a mixed batch: {mixed_seen}")
        # the mixed batch must still be awaiting a normal (caller-side)
        # harvest: the lane skipped both the eager materialize and the
        # eager route, so the cursor has not advanced past it
        with group._lock:
            pending = list(group.inflight)
        assert pending, "mixed batch was routed on the lane (async path lost)"
        seq, batch, dev, *_ = sorted(pending, key=lambda e: e[0])[0]
        parts = dev if isinstance(dev, list) else [(range(len(batch)), dev)]
        assert not all(isinstance(d, np.ndarray) for _, d in parts), (
            "mixed batch was eagerly materialized on the lane")
        scored = eng.flush()
        assert scored and all(0.0 <= p <= 1.0 for _, p in scored)
        assert len(eng.track_clip_scores) == 2, "both faces must be scored"
    finally:
        eng.close()


def test_routing_failure_surfaces_to_the_failing_batchs_stream():
    """ADVICE r4 #4: an exception raised while ROUTING a harvested batch
    (e.g. a poisoned per-track state) must surface to the streams that own
    THAT batch — not to whichever stream's thread happened to be harvesting,
    and never as a raise out of harvest() that could wedge a dispatch lane.
    The cursor still advances so the FIFO never jams."""
    import time

    from stdd_tpu.runtime.dispatch import _PendingClip

    pipe = PipelineConfig(clip_size=8, imsize=64, stride=4, detect_every=2,
                          batch_clips=2, min_face_side=8)
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    a = StreamingEngine(scorer, lambda f: np.empty((0, 15)), cfg=pipe,
                        crop_buffer=160)
    b = StreamingEngine(scorer, lambda f: np.empty((0, 15)), cfg=pipe,
                        crop_buffer=160, share_dispatch_from=a)
    group = a._group

    class Poison:
        def update(self, tid, p):
            raise RuntimeError("poisoned track state")

        def drop(self, tid):
            pass

    a.hysteresis = Poison()
    clip = _PendingClip(tid=7, entries=[], owner=a, owner_gen=a._gen,
                        t_enq=time.perf_counter())
    now = time.perf_counter()
    with group._lock:
        group.inflight.append(
            (group._next_seq, [clip], np.array([0.5], np.float32),
             now, now, now))
    group._next_seq += 1
    try:
        # B's thread harvests the FIFO head that belongs to A
        group.harvest(block=True)   # must NOT raise at the caller
        assert group._next_harvest_seq == group._next_seq, "cursor jammed"
        assert isinstance(a._worker_error, RuntimeError)
        assert b._worker_error is None, "error misrouted to the harvesting stream"
        import pytest

        with pytest.raises(RuntimeError, match="scoring worker failed"):
            a.step(np.zeros((120, 160, 3), np.uint8))
        b.step(np.zeros((120, 160, 3), np.uint8))   # B is unaffected
    finally:
        a.close()
        b.close()
