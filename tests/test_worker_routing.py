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
