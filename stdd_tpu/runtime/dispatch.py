"""Shared dispatch group: the device-side pipeline behind StreamingEngine.

Extracted from ``runtime/engine.py`` (round-2 VERDICT #8: the engine had
absorbed every mode). This module owns everything that is GROUP-level when
several call streams share one chip:

- the pending-clip pool and its batching cadence (``max_batch_wait_frames``),
- the two background upload lanes (packing + H2D of a batch blocks for
  seconds through the relay; off-thread it overlaps decode/track/score),
- the strict-FIFO harvest cursor that routes each clip's score back to the
  engine that produced it (``clip.owner``),
- the ring kernels/uploader shared by every device-resident track ring.

Per-stream state (tracker, buffers, rings, verdict accumulation) stays in
:class:`~stdd_tpu.runtime.engine.StreamingEngine`; per-stream errors are
routed to ``clip.owner._worker_error`` so a peer call's ``step()`` never
raises for an unrelated stream's failed batch.

Reference analogue: the batch_clips+AMP flush loop of ``TEST2.py:393`` —
re-architected as an async pipelined dispatcher because a TPU dispatch is
asynchronous and the host must keep feeding frames while a batch scores.
"""

from __future__ import annotations

import collections
import queue
import threading
from dataclasses import dataclass
from typing import Any, Deque, List, Optional, Tuple

import numpy as np

# queue sentinel: tells a dispatch lane to exit (DispatchGroup.close)
_CLOSE = object()


@dataclass
class _PendingClip:
    tid: int
    entries: List[Any]
    owner: Any = None             # engine whose stream produced this clip
    owner_gen: int = 0            # owner's reset generation at enqueue time
    tick: int = 0                 # group step counter at enqueue (batch-wait age)
    t_enq: float = 0.0            # perf_counter at enqueue (TEST2.py:316 latency)
    # device-ring mode: (dev_window [T,...] u8 in HBM, boxes [T,4],
    # lm5 [T,5,2], scale [T]) — entries stay metadata-only
    window: Optional[tuple] = None


class DispatchGroup:
    """Pack → upload → score → harvest pipeline shared by one or more
    engines. Engines enqueue clips and call :meth:`tick_and_dispatch` /
    :meth:`harvest`; results land in each clip owner's ``_ready`` list."""

    def __init__(self, scorer, cfg, crop_buffer: int, device_resident: bool,
                 max_batch_wait_frames, default_owner):
        self.scorer = scorer
        self.cfg = cfg
        self.crop_buffer = crop_buffer
        self.device_resident = device_resident
        self.max_batch_wait_frames = max_batch_wait_frames
        # errors from ownerless batches route here (never happens from
        # engine.step, which always stamps owners — this is a guard rail)
        self.default_owner = default_owner

        self.pending: List[_PendingClip] = []
        self._tick = 0
        # bounded: a never-reset serving root must not grow forever
        self.clip_latencies: Deque[float] = collections.deque(maxlen=10000)
        # per-clip stage stamps (t_enq, t_queued, t_worker, t_shipped,
        # t_fetch_start, t_done) — the window-latency budget decomposed:
        # queue wait / pack+dispatch / device+poll / D2H fetch. Always-on
        # (six floats per clip); bench reads percentiles for profiling.
        self.latency_stages: Deque[tuple] = collections.deque(maxlen=10000)
        # in-flight async device batches: (seq, clips, device_probs,
        # t_dispatch); harvested strictly in dispatch order (seq) so
        # per-track score sequences are deterministic even when the two
        # upload lanes finish out of order
        self.inflight: List[Tuple[int, List[_PendingClip], Any, float]] = []
        self._next_seq = 0
        self._next_harvest_seq = 0

        self._lock = threading.Lock()          # guards .inflight
        # guards pending / seq / age when streams of a shared group step
        # from different threads (RLock: _dispatch runs under it)
        self._state_lock = threading.RLock()
        self._harvest_lock = threading.Lock()  # serializes _harvest
        self._zero_lock = threading.Lock()     # one-time _zero_window build
        # one-time ring kernels/uploader build: two streams racing their
        # first _new_ring() must not each start a RingUploader (the loser's
        # thread would outlive close()) or double-compile the ring kernels
        self._lazy_lock = threading.Lock()
        self._dispatch_q = queue.Queue()
        # two upload lanes: through the relay a single 50MB H2D takes
        # seconds; two threads overlap consecutive batch uploads
        self._workers = [
            threading.Thread(target=self._dispatch_worker, daemon=True)
            for _ in range(2)
        ]
        for w in self._workers:
            w.start()

    # -- shared ring plumbing (device-resident mode) ------------------------

    def ring_kernels(self):
        from .packing import upload_format_of
        from .ring import RingKernels

        if not hasattr(self, "_ring_kernels"):
            with self._lazy_lock:
                if not hasattr(self, "_ring_kernels"):
                    self._ring_kernels = RingKernels(
                        R=self.cfg.clip_size, S=self.crop_buffer,
                        yuv420=upload_format_of(self.scorer) == "yuv420",
                    )
        return self._ring_kernels

    def ring_uploader(self):
        from .ring import RingUploader

        if not hasattr(self, "_ring_uploader"):
            with self._lazy_lock:
                if not hasattr(self, "_ring_uploader"):
                    self._ring_uploader = RingUploader()
        return self._ring_uploader

    def _zero_window_dev(self):
        # both upload lanes can race the first partial window batch; without
        # the lock they would each jit-materialize the buffer (ADVICE r2 #2)
        if not hasattr(self, "_zero_window"):
            with self._zero_lock:
                if not hasattr(self, "_zero_window"):
                    import jax.numpy as jnp

                    self._zero_window = jnp.zeros(
                        (self.cfg.clip_size,) + self.ring_kernels().slot_shape,
                        jnp.uint8,
                    )
        return self._zero_window

    def warmup(self) -> None:
        """Pre-compile the scorer for every batch capacity this group can
        ship, so no clip ever waits on an XLA compile."""
        from .packing import pow2_capacities

        if self.device_resident:
            self.ring_kernels().warmup(self.cfg.clip_size)
            self._zero_window_dev()
        self.scorer.warmup(
            self.crop_buffer, pow2_capacities(self.cfg.batch_clips),
            self.cfg.clip_size, windows=self.device_resident,
        )

    # -- lifecycle ----------------------------------------------------------

    def reset(self) -> None:
        """Group-root reset: drain queued/in-flight work from the previous
        stream FIRST so late arrivals can't leak scores into the new one."""
        self._dispatch_q.join()
        with self._lock:
            self.inflight = []
        with self._state_lock:
            self.pending = []
            self._tick = 0
        self.clip_latencies = collections.deque(maxlen=10000)
        self.latency_stages = collections.deque(maxlen=10000)
        self._next_seq = 0
        self._next_harvest_seq = 0

    def drop_owner(self, engine) -> None:
        """A secondary engine's reset: drop its queued-but-undispatched
        clips (no point uploading them); peers are undisturbed. Genuinely
        in-flight clips are discarded at harvest via the owner-generation
        check."""
        with self._state_lock:
            self.pending = [c for c in self.pending if c.owner is not engine]

    def close(self) -> None:
        """Shut down group-owned background threads: the ring uploader AND
        the two dispatch lanes (a parked daemon lane pins the whole
        group→engine→scorer graph alive — per-video engine loops would leak
        2 threads + an engine graph per call). Idempotent — call from the
        owning engine/server when the group is done (ADVICE r2 #3:
        background threads used to outlive their engines)."""
        up = getattr(self, "_ring_uploader", None)
        if up is not None:
            up.close()
            del self._ring_uploader
        workers, self._workers = self._workers, []
        for _ in workers:
            self._dispatch_q.put(_CLOSE)   # drains queued batches first
        for w in workers:
            w.join(timeout=30)

    # -- enqueue / dispatch --------------------------------------------------

    def enqueue(self, clip: _PendingClip) -> None:
        with self._state_lock:
            clip.tick = self._tick
            self.pending.append(clip)

    def tick_and_dispatch(self) -> None:
        """Advance the group step counter and ship every due batch: full
        batches always; in latency mode also a partial batch once its OLDEST
        clip has waited ``max_batch_wait_frames`` group steps (each clip
        carries its enqueue tick, so leftovers keep their age across partial
        dispatches)."""
        with self._state_lock:
            self._tick += 1
            wait = self.max_batch_wait_frames
            while len(self.pending) >= self.cfg.batch_clips or (
                self.pending
                and wait is not None
                and self._tick - self.pending[0].tick >= wait
            ):
                self._dispatch()

    def drain_snapshot(self) -> int:
        """Dispatch everything queued and return the sequence fence: batches
        with seq < fence cover every clip enqueued before this call."""
        with self._state_lock:
            while self.pending:
                self._dispatch()
            return self._next_seq

    def _dispatch(self) -> None:
        """Pack the next batch and hand it to the device WITHOUT blocking —
        JAX dispatch is async, so tracking/decode of subsequent frames
        overlaps with alignment+scoring of this batch (the TPU-native
        replacement for the reference's batch_clips+AMP flush,
        TEST2.py:393)."""
        import time

        with self._state_lock:
            batch = self.pending[: self.cfg.batch_clips]
            self.pending = self.pending[self.cfg.batch_clips:]
            if not batch:
                return
            # packing (downscale + zero-pad of B*T crops) happens on the
            # worker thread too, so the stepping thread only enqueues
            seq = self._next_seq
            self._next_seq += 1
        self._dispatch_q.put((seq, batch, time.perf_counter()))

    def _cap_for(self, n: int) -> int:
        """Next power-of-2 dispatch capacity ≥ n (bounded by batch_clips)."""
        from .packing import pow2_capacities

        return next(
            (c for c in pow2_capacities(self.cfg.batch_clips) if c >= n),
            self.cfg.batch_clips,
        )

    def _pack_and_score(self, batch: List[_PendingClip], path: str = "auto"):
        """Pack a (sub-)batch to the next power-of-2 capacity and dispatch it
        asynchronously — a padded batch uploads its full fixed-shape buffer,
        so shipping a 1-clip flush in an 8-slot buffer wastes 7/8 of the H2D
        bytes (the streaming bottleneck). Capacities are powers of two so the
        executable count stays at log2(batch_clips)+1 per path (jit caches
        per shape). → (device probs, boxes, lm5)."""
        from .packing import pack_clip_batch, upload_format_of

        cap = self._cap_for(len(batch))
        crops, boxes, lm5, valid = pack_clip_batch(
            [c.entries for c in batch], cap,
            self.cfg.clip_size, self.crop_buffer,
            yuv420=upload_format_of(self.scorer) == "yuv420",
        )
        return self.scorer.score_async(crops, boxes, lm5, valid, path=path), boxes, lm5

    def _batch_drift(self, batch: List[_PendingClip]) -> np.ndarray:
        """Per-clip Pallas-band drift for a pending batch, computed from the
        raw (unscaled) entries: the pack scale s = min(1, S/max_dim) scales
        the fitted |m10| linearly, so it's applied via clip_fit_drift's
        ``scale`` argument without packing first."""
        from .classifier import clip_fit_drift

        T = self.cfg.clip_size
        S = self.crop_buffer
        B = len(batch)
        boxes = np.zeros((B, T, 4), np.float32)
        lm5 = np.zeros((B, T, 5, 2), np.float32)
        scales = np.ones((B, T), np.float32)
        for bi, clip in enumerate(batch):
            entries = list(clip.entries)
            while len(entries) < T:
                entries = entries + [entries[-1]]
            max_dim = max(max(e.crop.shape[0], e.crop.shape[1]) for e in entries)
            s = min(1.0, S / float(max_dim))
            for ti, e in enumerate(entries[:T]):
                boxes[bi, ti] = np.asarray(e.big_box, np.float32)
                lm5[bi, ti] = np.asarray(e.lm5, np.float32)
            scales[bi] = s
        return clip_fit_drift(
            boxes, lm5, self.scorer.cfg.crop_size,
            template=np.asarray(self.scorer._template), scale=scales,
        )

    def _ship_windows(self, sub: List[_PendingClip]):
        """Dispatch device-ring windows: pixels are already in HBM, so only
        geometry (KBs) is uploaded. Pads to the next pow2 capacity."""
        T = self.cfg.clip_size
        cap = self._cap_for(len(sub))
        boxes = np.ones((cap, T, 4), np.float32)
        lm5 = np.ones((cap, T, 5, 2), np.float32)
        scale = np.ones((cap, T), np.float32)
        valid = np.zeros((cap,), bool)
        ws = []
        for k, clip in enumerate(sub):
            dev_w, b, l, s = clip.window
            ws.append(dev_w)
            boxes[k], lm5[k], scale[k] = b, l, s
            valid[k] = True
        if len(ws) < cap:
            ws.extend([self._zero_window_dev()] * (cap - len(ws)))
        return self.scorer.score_windows(ws, boxes, lm5, scale, valid)

    def _windows_drift(self, sub: List[_PendingClip]) -> np.ndarray:
        from .classifier import clip_fit_drift

        return clip_fit_drift(
            np.stack([c.window[1] for c in sub]),
            np.stack([c.window[2] for c in sub]),
            self.scorer.cfg.crop_size,
            template=np.asarray(self.scorer._template),
            scale=np.stack([c.window[3] for c in sub]),
        )

    def _score_batch(self, batch: List[_PendingClip]):
        """Route one dispatch batch to the device. Two orthogonal splits:

        - window clips (device-ring) vs host-packed clips ship through
          different programs (a crowd-overflow track has no ring, so a ring-
          mode batch CAN mix both);
        - within each, clips are split by the host-side drift probe
          (clip_fit_drift) so one out-of-envelope face demotes only its own
          sub-batch to the slow gather warp, never its peers (VERDICT r1 #5).

        Every sub-batch ships with path='auto': the scorer's in-graph
        envelope cond stays the correctness authority (the host probe fits
        the inverse map directly and can disagree near the band edge, so a
        statically forced branch could warp out-of-envelope rows silently),
        and 'auto' executables contain both branches, so the warmed set
        covers everything the router can dispatch — no hot-path compiles.

        → dev array (single ship covering the whole batch, in order) or
        ``[(indices, dev), ...]`` pieces for the harvester."""
        groups: List[Tuple[List[int], List[_PendingClip], bool]] = []
        idx_w = [i for i, c in enumerate(batch) if c.window is not None]
        idx_h = [i for i, c in enumerate(batch) if c.window is None]
        for idx, is_window in ((idx_w, True), (idx_h, False)):
            if not idx:
                continue
            sub = [batch[i] for i in idx]
            if getattr(self.scorer, "use_pallas_warp", False) and len(sub) > 1:
                drift = (self._windows_drift(sub) if is_window
                         else self._batch_drift(sub))
                band = self.scorer.warp_band
                in_b = [j for j, d in enumerate(drift) if d <= band]
                out_b = [j for j, d in enumerate(drift) if d > band]
                subgroups = [g for g in (in_b, out_b) if g]
            else:
                subgroups = [list(range(len(sub)))]
            for g in subgroups:
                groups.append(([idx[j] for j in g], [sub[j] for j in g],
                               is_window))

        def ship(sub, is_window):
            if is_window:
                return self._ship_windows(sub)
            dev, _, _ = self._pack_and_score(sub, path="auto")
            return dev

        if len(groups) == 1:
            idx, sub, is_window = groups[0]
            return ship(sub, is_window)   # idx == range(len(batch)), in order
        return [(idx, ship(sub, is_window)) for idx, sub, is_window in groups]

    def _dispatch_worker(self) -> None:
        while True:
            item = self._dispatch_q.get()
            if item is _CLOSE:
                self._dispatch_q.task_done()
                return
            batch: List[_PendingClip] = []
            try:
                if item is None:
                    continue
                import time

                seq, batch, t0 = item
                t_worker = time.perf_counter()
                dev = self._score_batch(batch)
                t_shipped = time.perf_counter()
                # Ring mode: materialize the probs HERE, on the lane
                # thread, and route immediately. Harvesting only from
                # the stepping thread quantizes window latency to the
                # step cadence and pays a separate D2H round trip
                # through the relay (~27 ms measured); a window batch
                # is kilobytes, so blocking this lane for the device
                # compute costs nothing at streaming clip rates and
                # the second lane keeps dispatching. The packed-upload
                # path stays async: its lanes pipeline multi-second
                # H2D uploads and must not serialize behind fetches —
                # so a MIXED batch (crowd-overflow clips have no ring and
                # ship host-packed) keeps the async path too: eagerly
                # materializing its packed sub-batch would block this lane
                # on a multi-second H2D upload (ADVICE r4 #1).
                eager = (self.device_resident
                         and all(c.window is not None for c in batch))
                if eager:
                    parts = (dev if isinstance(dev, list)
                             else [(range(len(batch)), dev)])
                    dev = [(idx, np.asarray(d)) for idx, d in parts]
                with self._lock:
                    self.inflight.append((seq, batch, dev, t0, t_worker,
                                          t_shipped))
                if eager:
                    # route now if this batch is the FIFO head (strict seq
                    # order is still enforced inside harvest); owners see
                    # the score at their next step() without an extra tick.
                    # Own try: the batch is already in `inflight`, so the
                    # outer handler's seq sentinel must NOT fire for a
                    # routing failure — a duplicate seq entry behind the
                    # advanced cursor would wedge the FIFO head check.
                    # Per-batch routing/fetch failures are caught INSIDE
                    # _harvest_locked and surfaced to the failing batch's
                    # own streams (the FIFO head may belong to a different
                    # stream than the batch this lane just shipped — ADVICE
                    # r4 #4); anything escaping here is infrastructure, so
                    # it goes to the default stream, not a guessed owner.
                    try:
                        self.harvest(block=False)
                    except Exception as exc:
                        import traceback

                        traceback.print_exc()
                        self.default_owner._worker_error = exc
            except Exception as exc:
                # a dead worker would deadlock every later _dispatch_q.join();
                # keep the thread alive, drop the batch (a None sentinel so
                # the FIFO harvest cursor still advances), and surface the
                # error ONLY to the streams whose clips were in the failed
                # batch — a peer call's step() must not crash on an
                # unrelated stream's upload failure
                import traceback

                traceback.print_exc()
                owners = {c.owner or self.default_owner for c in batch} or {
                    self.default_owner}
                for owner in owners:
                    owner._worker_error = exc
                if item is not None:
                    with self._lock:
                        self.inflight.append((item[0], [], None, item[2],
                                              item[2], item[2]))
            finally:
                self._dispatch_q.task_done()

    # -- harvest ------------------------------------------------------------

    def harvest(self, block: bool) -> None:
        """Collect finished device batches and route each clip's score to
        the engine that produced it (``clip.owner``); with ``block=False``
        only batches whose results are already materialized are taken (plus
        forced takes when the pipeline depth exceeds 2, to bound memory).
        Callers read their own results from ``engine._take_ready``."""
        if not self._harvest_lock.acquire(blocking=block):
            # another stream's thread is already harvesting; its pass will
            # route our results too
            return
        try:
            self._harvest_locked(block)
        finally:
            self._harvest_lock.release()

    def harvest_until(self, target_seq: int) -> None:
        """Blocking harvest of every batch dispatched before ``target_seq``
        (exclusive). Unlike a queue join, this cannot be extended by peers
        dispatching new work while we wait. The target check happens under
        ``_harvest_lock``: the cursor only advances after a batch's scores
        are fully routed, so once the target is observed every score up to
        it has landed in its owner's _ready/track_clip_scores."""
        import time

        while True:
            with self._harvest_lock:
                self._harvest_locked(block=True, until_seq=target_seq)
                done = self._next_harvest_seq >= target_seq
            if done:
                return
            time.sleep(0.002)   # head batch is still packing on a worker

    def _harvest_locked(self, block: bool, until_seq: Optional[int] = None) -> None:
        import time

        while True:
            if until_seq is not None and self._next_harvest_seq >= until_seq:
                # a flushing stream's snapshotted target: batches peers
                # dispatched AFTER the snapshot are not its problem — without
                # this bound, a flush under sustained peer dispatch blocks on
                # batch after batch while holding _harvest_lock
                break
            with self._lock:
                entries = sorted(self.inflight, key=lambda e: e[0])
            if not entries:
                break
            # strict FIFO: only ever take the oldest in-flight batch, so
            # score order == dispatch order regardless of which upload lane
            # finishes first. When the pipeline is deeper than 2 batches the
            # head is force-taken (blocking) to bound device memory.
            entry = entries[0]
            seq, batch, dev, t0, t_worker, t_shipped = entry
            if seq != self._next_harvest_seq:
                # the true head batch is still being packed on a worker
                break
            if dev is None:           # failed batch (worker exception) — the
                with self._lock:      # error already surfaced above; advance
                    self.inflight.remove(entry)
                self._next_harvest_seq += 1
                continue
            # a routed mixed batch carries a list of (indices, dev) sub-
            # batches (per-clip Pallas/gather routing); normalize to a list
            parts = dev if isinstance(dev, list) else [(range(len(batch)), dev)]
            if not block and len(entries) <= 2:
                try:
                    if not all(bool(d.is_ready()) for _, d in parts):
                        break
                except AttributeError:
                    pass
            t_fetch_start = time.perf_counter()
            try:
                probs = np.zeros((len(batch),), np.float32)
                for idx, d in parts:
                    sub = np.asarray(d)
                    for k, bi in enumerate(idx):
                        probs[bi] = sub[k]
            except Exception as exc:
                # a device-side failure must not wedge the FIFO: drop the
                # batch, advance the cursor, and surface the error to the
                # streams that owned the batch's clips (raised at their next
                # step()/flush()), not to whoever happens to harvest
                with self._lock:
                    if entry in self.inflight:
                        self.inflight.remove(entry)
                for owner in {c.owner or self.default_owner for c in batch} or {
                        self.default_owner}:
                    owner._worker_error = exc
                self._next_harvest_seq += 1
                continue
            now = time.perf_counter()
            with self._lock:
                try:
                    self.inflight.remove(entry)
                except ValueError:
                    continue
            try:
                for bi, clip in enumerate(batch):
                    # per-clip enqueue→scored latency, the reference's
                    # clip_enqueue_t/clip_infer_t accounting (TEST2.py:316,440)
                    self.clip_latencies.append(now - (clip.t_enq or t0))
                    self.latency_stages.append(
                        (clip.t_enq or t0, t0, t_worker, t_shipped,
                         t_fetch_start, now))
                    owner = clip.owner or self.default_owner
                    if owner._gen != clip.owner_gen:
                        continue  # owner's stream was reset; stale score
                    p = float(probs[bi])
                    owner.track_clip_scores[clip.tid].append(p)
                    owner.hysteresis.update(clip.tid, p)
                    with owner._ready_lock:
                        owner._ready.append((clip.tid, p))
            except Exception as exc:
                # a routing failure belongs to THIS batch's streams — the
                # caller may be a dispatch lane that just shipped a
                # DIFFERENT batch (ADVICE r4 #4), so surface it here, to
                # the owners of the entry being harvested, and keep the
                # cursor advancing exactly like the fetch-failure path
                for owner in {c.owner or self.default_owner for c in batch} or {
                        self.default_owner}:
                    owner._worker_error = exc
            # advance the cursor only AFTER routing: _harvest_until's target
            # check (under _harvest_lock) must imply the scores have landed
            self._next_harvest_seq += 1
