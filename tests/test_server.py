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
    """Batches mix clips from both calls; every per-clip score must match
    the score the same stream gets when served alone. Tolerance is loose-ish
    (1e-4): with the bounded-latency default the standalone run may ship
    B=1 partial batches where the server fills B=2, and different batch
    capacities are different XLA executables with different fusion
    rounding (~1e-6 drift)."""
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
        assert set(per_track) == set(solo), (sid, per_track, solo)
        for tid in solo:
            assert per_track[tid] == pytest.approx(solo[tid], abs=1e-4), (
                sid, tid, per_track[tid], solo[tid])


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


def test_concurrent_threaded_streams_match_standalone():
    """The deployment shape: each call stepped from its own thread. The
    shared group's pending/seq/harvest state must stay consistent — every
    stream's per-track score sequence equals its standalone run."""
    import threading

    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    frame = _frame()
    solo = _collect_standalone(scorer, 30, frame)

    server = MultiStreamServer(scorer, cfg=PIPE, **ENG_KW)
    sids = [server.add_stream(make_fake_detector()) for _ in range(3)]
    got = {sid: [] for sid in sids}
    errs = []

    def run(sid):
        try:
            for _ in range(30):
                got[sid] += server.step(sid, frame)
            got[sid] += server.flush(sid)
        except BaseException as e:   # pragma: no cover - failure path
            errs.append(e)

    threads = [threading.Thread(target=run, args=(sid,)) for sid in sids]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    # a racing flush may drain results into a peer's routing pass before
    # this stream's own flush returns; collect the remainder
    for sid in sids:
        got[sid] += server.engine(sid)._take_ready()
    for sid in sids:
        per_track = {}
        for tid, p in got[sid]:
            per_track.setdefault(tid, []).append(p)
        # same clips, same order; values may drift ~1e-7 because a clip can
        # land in a different batch-capacity executable than in the solo run
        assert set(per_track) == set(solo)
        for tid in solo:
            np.testing.assert_allclose(per_track[tid], solo[tid], atol=1e-5)


def test_server_warmup_precompiles_all_capacities():
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    server = MultiStreamServer(scorer, cfg=PIPE, **ENG_KW)
    server.warmup()   # PIPE.batch_clips=2 → capacities (1, 2)
    sizes = {2}
    # the jit cache now holds one executable per capacity: serving a stream
    # afterwards must not add new compilations for these shapes (smoke: the
    # scorer accepts both capacities without error)
    import numpy as np

    for b in (1, 2):
        crops = np.zeros((b, PIPE.clip_size, 160, 160, 3), np.uint8)
        boxes = np.ones((b, PIPE.clip_size, 4), np.float32)
        lm5 = np.ones((b, PIPE.clip_size, 5, 2), np.float32)
        valid = np.ones((b,), bool)
        probs = scorer.score(crops, boxes, lm5, valid)
        assert probs.shape == (b,)


def test_secondary_engine_delegates_group_attrs():
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    server = MultiStreamServer(scorer, cfg=PIPE, **ENG_KW)
    sid = server.add_stream(make_fake_detector())
    eng = server.engine(sid)
    assert eng.clip_latencies is server._root.clip_latencies
    assert eng.pending is server._root.pending
    with pytest.raises(AttributeError):
        eng.no_such_attribute


def test_secondary_reset_clears_its_pending_clips():
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    # huge batch so nothing dispatches; pending accumulates
    pipe = PipelineConfig(clip_size=8, imsize=64, stride=4, detect_every=2,
                          batch_clips=64, min_face_side=10)
    server = MultiStreamServer(scorer, cfg=pipe, max_batch_wait_frames=10 ** 9,
                               **ENG_KW)
    a = server.add_stream(make_fake_detector())
    b = server.add_stream(make_fake_detector())
    frame = _frame()
    for _ in range(20):
        server.step(a, frame)
        server.step(b, frame)
    eng_a = server.engine(a)
    assert any(c.owner is eng_a for c in server._root.pending)
    eng_a.reset()
    assert not any(c.owner is eng_a for c in server._root.pending)
    assert any(c.owner is server.engine(b) for c in server._root.pending)


def test_group_level_wait_must_be_set_on_root():
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    root = StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                           max_batch_wait_frames=5, **ENG_KW)
    with pytest.raises(ValueError, match="group-level"):
        StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                        share_dispatch_from=root, max_batch_wait_frames=7,
                        **ENG_KW)
    # same value or None are fine
    StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                    share_dispatch_from=root, max_batch_wait_frames=5, **ENG_KW)
    StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                    share_dispatch_from=root, **ENG_KW)


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


def test_server_ring_mode_defaults_to_eager_dispatch():
    """In device-ring mode window dispatches carry no pixels, so the server
    must inherit the engine's eager default (wait 0) instead of holding a
    sparse call's window a whole stride for peers — that wait is pure p50
    window latency."""
    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    ring_srv = MultiStreamServer(scorer, cfg=PIPE, device_resident=True,
                                 q_weighting=False, q_lap_hard=0.0)
    assert ring_srv._root.max_batch_wait_frames == 0
    packed_srv = MultiStreamServer(scorer, cfg=PIPE, device_resident=False,
                                   q_weighting=False, q_lap_hard=0.0)
    assert packed_srv._root.max_batch_wait_frames == PIPE.stride


def test_concurrent_threaded_streams_ring_mode():
    """Threaded calls in device-ring mode: the shared RingUploader, per-ring
    error bookkeeping and the group's window dispatch must stay consistent
    when streams step from their own threads. Each stream's per-track score
    sequence must equal its standalone ring-mode run."""
    import threading

    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    frame = _frame()

    def solo_run():
        eng = StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                              device_resident=True, **ENG_KW)
        out = []
        for _ in range(30):
            out += eng.step(frame)
        out += eng.flush()
        per = {}
        for tid, p in out:
            per.setdefault(tid, []).append(p)
        return per

    solo = solo_run()
    assert solo and all(v for v in solo.values())

    server = MultiStreamServer(scorer, cfg=PIPE, device_resident=True,
                               **ENG_KW)
    sids = [server.add_stream(make_fake_detector()) for _ in range(3)]
    got = {sid: [] for sid in sids}
    errs = []

    def run(sid):
        try:
            for _ in range(30):
                got[sid] += server.step(sid, frame)
            got[sid] += server.flush(sid)
        except BaseException as e:   # pragma: no cover - failure path
            errs.append(e)

    threads = [threading.Thread(target=run, args=(sid,)) for sid in sids]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    for sid in sids:
        got[sid] += server.engine(sid)._take_ready()
    for sid in sids:
        per = {}
        for tid, p in got[sid]:
            per.setdefault(tid, []).append(p)
        assert set(per) == set(solo)
        for tid in solo:
            np.testing.assert_allclose(per[tid], solo[tid], atol=1e-5)


def test_close_releases_uploader_and_rings():
    """engine/server close() must stop the shared ring uploader thread and
    release per-ring bookkeeping (ADVICE r2 #3: uploader daemons used to
    outlive their engines in per-video loops); close is idempotent and a
    closed secondary never disturbs the group's peers."""
    import time

    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    eng = StreamingEngine(
        scorer, make_fake_detector(1), cfg=PIPE, device_resident=True,
        **ENG_KW,
    )
    for _ in range(12):
        eng.step(_frame())
    eng.flush()
    assert eng.rings
    up = eng._group.ring_uploader()
    thread = up._thread
    lanes = list(eng._group._workers)
    assert thread.is_alive()
    assert lanes and all(w.is_alive() for w in lanes)
    eng.close()
    assert not eng.rings                     # rings released
    thread.join(timeout=5.0)
    assert not thread.is_alive()             # uploader worker exited
    for w in lanes:                          # dispatch lanes exited too — a
        w.join(timeout=5.0)                  # parked lane pins the whole
        assert not w.is_alive()              # group→engine→scorer graph
    eng.close()                              # idempotent

    server = MultiStreamServer(scorer, cfg=PIPE, device_resident=True,
                               **ENG_KW)
    a = server.add_stream(make_fake_detector(1))
    for _ in range(10):
        server.step(a, _frame())
    server.flush(a)
    server.close()
    assert not server.streams


def test_per_video_engine_loop_leaks_no_threads_and_frees_the_graph():
    """The per-video serving pattern (fresh engine per call, close() after)
    must not accumulate background threads, and a closed engine's object
    graph must be collectable — a parked dispatch lane used to pin the
    whole group->engine graph alive forever."""
    import gc
    import threading
    import time as _time
    import weakref

    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32)
    base = threading.active_count()
    refs = []
    for i in range(5):
        eng = StreamingEngine(scorer, make_fake_detector(), cfg=PIPE,
                              device_resident=True, **ENG_KW)
        for _ in range(8):
            eng.step(_frame(seed=i))
        eng.flush()
        eng.close()
        refs.append(weakref.ref(eng))
        del eng

    deadline = _time.time() + 15
    while threading.active_count() > base and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= base, (
        threading.active_count(), base, threading.enumerate())

    gc.collect()
    alive = [r for r in refs if r() is not None]
    assert not alive, f"{len(alive)} closed engines still pinned in memory"
