"""Device-resident per-track crop rings for the live streaming path.

The round-1 engine re-uploaded every window's 32 crops as one 25-50 MB
batch at each stride tick — through a bandwidth-capped link that burst is
the whole window latency (VERDICT r1 #2). Here each frame's crop is
uploaded ONCE on arrival (~100 KB, fully pipelined with device compute),
accumulated in an HBM ring per track, and a window dispatch moves only
kilobytes of geometry metadata: the 32-frame pixel window is an on-device
gather over the ring.

Geometry stays host-side and UNSCALED; each frame records its own pack
scale ``s_t = min(1, S/max_dim)`` and the scorer folds it into the warp
(``ClipScorer._score_impl(scale=...)``) — exact, because a similarity
absorbs a uniform scale (reference semantics: one clip-stable transform,
``faster_crop_align_xray.py:11``; latency accounting: enqueue→scored,
``TEST2.py:316,440-444``).

Ordering note: pushes and window gathers are issued from the stepping
thread in program order, and a JAX device executes its stream FIFO, so a
gather snapshot can never observe a later frame's overwrite. Ring updates
donate their buffer (in-place when the runtime allows, copy otherwise).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class RingUploader:
    """Background H2D pusher: the stepping thread packs a slot (host numpy)
    and returns immediately; the upload — ~100 KB through a ~25 MB/s relay,
    i.e. several ms of wire time — happens here, overlapped with the next
    frame's detection/tracking (the transfer is IO: the GIL is released).

    One uploader per dispatch group; a single worker keeps pushes FIFO so a
    ring's device state always reflects pushes in arrival order.
    ``sync(ring)`` blocks until every queued push for that ring has been
    dispatched — window() calls it before gathering, which costs at most the
    last frame's in-flight upload."""

    def __init__(self):
        self._q: "queue.Queue[Optional[tuple]]" = queue.Queue()
        self._pending: Dict[int, int] = {}
        self._cv = threading.Condition()
        # per-ring errors: an upload failure must surface at ITS ring's next
        # sync and nowhere else — with one shared error slot, stream B's
        # window() would crash on stream A's failed push while A's corrupted
        # ring went on scoring stale pixels silently
        self._errs: Dict[int, BaseException] = {}
        self._thread = threading.Thread(
            target=self._run, name="ring-upload", daemon=True)
        self._thread.start()

    def submit(self, ring: "DeviceRing", slots: np.ndarray, i0: int,
               k: int) -> None:
        """Queue a group push of ``slots[:k]`` at positions i0..i0+k-1."""
        with self._cv:
            self._pending[id(ring)] = self._pending.get(id(ring), 0) + 1
        self._q.put((ring, slots, i0, k))

    def sync(self, ring: "DeviceRing") -> None:
        rid = id(ring)
        with self._cv:
            while self._pending.get(rid, 0) and rid not in self._errs:
                self._cv.wait(timeout=0.05)
            err = self._errs.pop(rid, None)
        if err is not None:
            raise RuntimeError("ring upload failed") from err

    def forget(self, ring: "DeviceRing") -> None:
        """Drop this ring's bookkeeping (eviction/GC): id() values of dead
        rings get recycled, so stale entries must not linger. The closed
        flag also stops the worker from re-inserting bookkeeping for a
        still-queued push that completes after this call."""
        ring.closed = True
        with self._cv:
            self._pending.pop(id(ring), None)
            self._errs.pop(id(ring), None)

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            ring, slots, i0, k = item
            try:
                ring.ring = ring.k.push_many(
                    ring.ring, jnp.asarray(slots[:k]), jnp.int32(i0), k)
            except BaseException as e:  # surfaced at THIS ring's next sync()
                ring.broken = True      # HBM state is missing a frame now
                with self._cv:
                    if not ring.closed:   # a forgotten ring must not leave a
                        self._errs[id(ring)] = e   # stale entry a recycled
                        # id() could inherit
            finally:
                with self._cv:
                    n = self._pending.get(id(ring), 1) - 1
                    if n <= 0 or ring.closed:
                        self._pending.pop(id(ring), None)
                    else:
                        self._pending[id(ring)] = n
                    self._cv.notify_all()

    def close(self) -> None:
        self._q.put(None)


class RingKernels:
    """Jitted push/gather programs shared by every ring of one shape
    family. Pushes are BATCHED: ``push_many`` writes ``k`` consecutive
    (mod R) slots in one device op, so the per-op relay overhead is paid
    once per group instead of once per frame. Executable count stays at
    1 (gather) + one push variant per group size in ``push_group_sizes``."""

    def __init__(self, R: int, S: int, yuv420: bool, batch_k: int = 4):
        self.R, self.S, self.yuv420 = R, S, yuv420
        self.batch_k = batch_k
        self.slot_shape = (S * 3 // 2, S) if yuv420 else (S, S, 3)
        self._push_many_cache = {}

        def push(ring, slot, i):
            return jax.lax.dynamic_update_index_in_dim(ring, slot, i, axis=0)

        self._push = jax.jit(push, donate_argnums=0)

        def window(ring, head, T):
            idx = (head - T + 1 + jnp.arange(T)) % R
            return jnp.take(ring, idx, axis=0)

        self._window = jax.jit(window, static_argnums=2)

        def window_padded(ring, head, k, T):
            # last k frames (oldest first) then the newest frame repeated to
            # length T — the reference's short-window padding (TEST2.py:
            # 358-363), for sub-stride provisional windows on young tracks
            idx = (head - (k - 1) + jnp.minimum(jnp.arange(T), k - 1)) % R
            return jnp.take(ring, idx, axis=0)

        self._window_padded = jax.jit(window_padded, static_argnums=3)

    def push_many(self, ring, slots, i0, k: int):
        """Write ``slots[:k]`` into positions ``i0 .. i0+k-1 (mod R)``."""
        fn = self._push_many_cache.get(k)
        if fn is None:
            R = self.R

            def pm(ring, slots, i0):
                def body(r, j):
                    return jax.lax.dynamic_update_index_in_dim(
                        r, slots[j], (i0 + j) % R, 0), None

                ring, _ = jax.lax.scan(body, ring, jnp.arange(k))
                return ring

            fn = self._push_many_cache[k] = jax.jit(pm, donate_argnums=0)
        return fn(ring, slots, i0)

    def empty(self):
        return jnp.zeros((self.R,) + self.slot_shape, jnp.uint8)

    def warmup(self, T: int) -> None:
        ring = self.empty()
        ring = self._push(ring, jnp.zeros(self.slot_shape, jnp.uint8),
                          jnp.int32(0))
        for k in range(1, self.batch_k + 1):   # partial flushes hit any k
            ring = self.push_many(
                ring, jnp.zeros((k,) + self.slot_shape, jnp.uint8),
                jnp.int32(0), k)
        jax.block_until_ready(self._window(ring, jnp.int32(0), T))
        jax.block_until_ready(
            self._window_padded(ring, jnp.int32(0), jnp.int32(1), T))


class DeviceRing:
    """One track's HBM crop ring + host-side geometry rings."""

    def __init__(self, kernels: RingKernels, uploader: Optional[RingUploader] = None):
        self.k = kernels
        self.uploader = uploader
        R = kernels.R
        self.ring = kernels.empty()
        self.boxes = np.zeros((R, 4), np.float32)
        self.lm5 = np.zeros((R, 5, 2), np.float32)
        self.scale = np.ones((R,), np.float32)
        self.head = -1
        self.count = 0
        # set by the uploader when a push for THIS ring fails: the HBM state
        # is missing a frame, so the engine drops and re-creates the ring
        self.broken = False
        # set by uploader.forget(): late-completing queued pushes for a
        # dropped ring must not write bookkeeping a recycled id() inherits
        self.closed = False
        # host staging: frames pack here and ship as ONE device op per
        # batch_k group (per-op relay overhead paid once per group)
        self._staged = np.zeros((kernels.batch_k,) + kernels.slot_shape, np.uint8)
        self._n_staged = 0
        self._rgb_slot = (
            np.zeros((kernels.S, kernels.S, 3), np.uint8)
            if kernels.yuv420 else None
        )

    def push(self, crop: np.ndarray, big_box: np.ndarray, lm5: np.ndarray) -> None:
        """Stage one frame's crop (scaled into the S-slot) and record its
        unscaled geometry. ``lm5`` is crop-local, ``big_box`` absolute.
        Every ``batch_k`` frames the staged group ships as one device op —
        on the uploader's worker thread when one is attached."""
        from .packing import _encode_slot_yuv420, _pack_entry

        S = self.k.S
        s = min(1.0, S / float(max(crop.shape[0], crop.shape[1])))
        e = dict(crop=crop, big_box=big_box, lm5=lm5)
        slot = self._staged[self._n_staged]
        if self.k.yuv420:
            # _encode_slot_yuv420 zeroes + fills the RGB slot then I420-packs
            _encode_slot_yuv420(e, self._rgb_slot, s, slot)
        else:
            slot[:] = 0
            _pack_entry(e, slot, s)
        self._n_staged += 1
        self.head = (self.head + 1) % self.k.R
        self.count += 1
        self.boxes[self.head] = np.asarray(big_box, np.float32)
        self.lm5[self.head] = np.asarray(lm5, np.float32)
        self.scale[self.head] = s
        if self._n_staged == self.k.batch_k:
            self.flush_staged()

    def flush_staged(self) -> None:
        """Ship the staged group (one jitted scan-update op)."""
        k = self._n_staged
        if not k:
            return
        self._n_staged = 0
        i0 = (self.head - k + 1) % self.k.R
        if self.uploader is not None:
            # the staging buffer is reused next frame — the worker gets a copy
            self.uploader.submit(self, self._staged[:k].copy(), i0, k)
        else:
            self.ring = self.k.push_many(
                self.ring, jnp.asarray(self._staged[:k]), jnp.int32(i0), k)

    def close(self) -> None:
        """Release the uploader's per-ring bookkeeping (call on eviction)."""
        self.closed = True
        if self.uploader is not None:
            self.uploader.forget(self)

    def window(self, T: int):
        """Snapshot the last ``T`` frames as an on-device gather (async) +
        host geometry, oldest first. Requires ``count >= T``."""
        if self.count < T:
            raise ValueError(f"ring holds {self.count} < {T} frames")
        self.flush_staged()              # device ring must include every push
        if self.uploader is not None:
            self.uploader.sync(self)
        dev = self.k._window(self.ring, jnp.int32(self.head), T)
        idx = (self.head - T + 1 + np.arange(T)) % self.k.R
        return dev, self.boxes[idx].copy(), self.lm5[idx].copy(), self.scale[idx].copy()

    def window_padded(self, T: int):
        """Provisional sub-stride window for a young track: the last
        ``min(count, T)`` frames padded at the end by repeating the newest
        frame (the reference's short-window padding, TEST2.py:358-363).
        Requires ``count >= 1``."""
        if self.count < 1:
            raise ValueError("ring is empty")
        k = min(self.count, T)
        self.flush_staged()
        if self.uploader is not None:
            self.uploader.sync(self)
        dev = self.k._window_padded(self.ring, jnp.int32(self.head),
                                    jnp.int32(k), T)
        idx = (self.head - (k - 1) + np.minimum(np.arange(T), k - 1)) % self.k.R
        return dev, self.boxes[idx].copy(), self.lm5[idx].copy(), self.scale[idx].copy()
