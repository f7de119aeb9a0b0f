"""MultiStreamServer: cross-stream batching of concurrent calls on one
scorer, with per-stream result routing and lifecycle isolation."""

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig, PipelineConfig
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.runtime.engine import StreamingEngine
from stdd_tpu.runtime.server import MultiStreamServer
from tests.test_engine import PIPE, SMALL_CFG, make_fake_detector


def _frame(seed=0, h=240, w=320):
    return np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)


ENG_KW = dict(crop_buffer=160, q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False)


def _collect_standalone(scorer, n_steps, frame):
    eng = StreamingEngine(scorer, make_fake_detector(), cfg=PIPE, **ENG_KW)
    for _ in range(n_steps):
        eng.step(frame)
    eng.flush()
    return {t: list(s) for t, s in eng.track_clip_scores.items()}


def test_two_streams_match_standalone_scores():
    """Batches mix clips from both calls; every per-clip score must equal
    the score the same stream gets when served alone (scoring is per-clip
    deterministic — batch composition is irrelevant)."""
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    frame = _frame()
    solo = _collect_standalone(scorer, 30, frame)
    assert solo, "fixture must produce scores"

    server = MultiStreamServer(scorer, cfg=PIPE, **ENG_KW)
    a = server.add_stream(make_fake_detector())
    b = server.add_stream(make_fake_detector())
    got = {a: [], b: []}
    for _ in range(30):
        got[a] += server.step(a, frame)
        got[b] += server.step(b, frame)
    got[a] += server.flush(a)
    got[b] += server.flush(b)

    for sid in (a, b):
        per_track = {}
        for tid, p in got[sid]:
            per_track.setdefault(tid, []).append(p)
        assert per_track == pytest.approx(solo), (sid, per_track, solo)


def test_finish_one_stream_keeps_peer_alive():
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    frame = _frame()
    server = MultiStreamServer(scorer, cfg=PIPE, **ENG_KW)
    a = server.add_stream(make_fake_detector())
    b = server.add_stream(make_fake_detector())
    for _ in range(20):
        server.step(a, frame)
        server.step(b, frame)
    verdict = server.finish(a)
    assert verdict.raw_scores, "finished call aggregates its clips"
    assert a not in server.streams
    more = []
    for _ in range(12):
        more += server.step(b, frame)
    more += server.flush(b)
    assert more, "surviving stream keeps scoring after a peer ends"


def test_secondary_reset_drops_stale_scores_only():
    """Resetting one stream mid-flight must not leak its old scores into the
    new stream, and must not drop the peer's."""
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    frame = _frame()
    server = MultiStreamServer(scorer, cfg=PIPE, **ENG_KW)
    a = server.add_stream(make_fake_detector())
    b = server.add_stream(make_fake_detector())
    for _ in range(12):   # enough to enqueue clips, not to harvest them all
        server.step(a, frame)
        server.step(b, frame)
    server.engine(a).reset()
    out_a = server.flush(a)
    out_b = server.flush(b)
    assert out_a == []          # stale generation dropped
    assert out_b                # peer unaffected
    assert server.engine(a).track_clip_scores == {}


def test_shared_dispatch_validation():
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    other = ClipScorer(scorer.variables, cfg=SMALL_CFG, dtype=jnp.float32)
    root = StreamingEngine(scorer, make_fake_detector(), cfg=PIPE, **ENG_KW)
    with pytest.raises(ValueError, match="one scorer"):
        StreamingEngine(other, make_fake_detector(), cfg=PIPE,
                        share_dispatch_from=root, **ENG_KW)
    with pytest.raises(ValueError, match="crop_buffer"):
        kw = dict(ENG_KW, crop_buffer=96)
        StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                        share_dispatch_from=root, **kw)
    second = StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                             share_dispatch_from=root, **ENG_KW)
    with pytest.raises(ValueError, match="group-root"):
        StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                        share_dispatch_from=second, **ENG_KW)
