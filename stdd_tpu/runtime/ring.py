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

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class RingKernels:
    """Jitted push/gather programs shared by every ring of one shape
    family — executable count stays at 2 per (R, S, format)."""

    def __init__(self, R: int, S: int, yuv420: bool):
        self.R, self.S, self.yuv420 = R, S, yuv420
        self.slot_shape = (S * 3 // 2, S) if yuv420 else (S, S, 3)

        def push(ring, slot, i):
            return jax.lax.dynamic_update_index_in_dim(ring, slot, i, axis=0)

        self._push = jax.jit(push, donate_argnums=0)

        def window(ring, head, T):
            idx = (head - T + 1 + jnp.arange(T)) % R
            return jnp.take(ring, idx, axis=0)

        self._window = jax.jit(window, static_argnums=2)

    def empty(self):
        return jnp.zeros((self.R,) + self.slot_shape, jnp.uint8)

    def warmup(self, T: int) -> None:
        ring = self.empty()
        ring = self._push(ring, jnp.zeros(self.slot_shape, jnp.uint8),
                          jnp.int32(0))
        jax.block_until_ready(self._window(ring, jnp.int32(0), T))


class DeviceRing:
    """One track's HBM crop ring + host-side geometry rings."""

    def __init__(self, kernels: RingKernels):
        self.k = kernels
        R = kernels.R
        self.ring = kernels.empty()
        self.boxes = np.zeros((R, 4), np.float32)
        self.lm5 = np.zeros((R, 5, 2), np.float32)
        self.scale = np.ones((R,), np.float32)
        self.head = -1
        self.count = 0
        # reusable host slot: crop → S×S zero-padded (+ optional I420 encode)
        self._slot = np.zeros(kernels.slot_shape, np.uint8)
        self._rgb_slot = (
            np.zeros((kernels.S, kernels.S, 3), np.uint8)
            if kernels.yuv420 else None
        )

    def push(self, crop: np.ndarray, big_box: np.ndarray, lm5: np.ndarray) -> None:
        """Upload one frame's crop (scaled into the S-slot) and record its
        unscaled geometry. ``lm5`` is crop-local, ``big_box`` absolute."""
        from .packing import _encode_slot_yuv420, _pack_entry

        S = self.k.S
        s = min(1.0, S / float(max(crop.shape[0], crop.shape[1])))
        e = dict(crop=crop, big_box=big_box, lm5=lm5)
        if self.k.yuv420:
            # _encode_slot_yuv420 zeroes + fills the RGB slot then I420-packs
            _encode_slot_yuv420(e, self._rgb_slot, s, self._slot)
        else:
            self._slot[:] = 0
            _pack_entry(e, self._slot, s)
        self.head = (self.head + 1) % self.k.R
        self.count += 1
        self.ring = self.k._push(
            self.ring, jnp.asarray(self._slot), jnp.int32(self.head)
        )
        self.boxes[self.head] = np.asarray(big_box, np.float32)
        self.lm5[self.head] = np.asarray(lm5, np.float32)
        self.scale[self.head] = s

    def window(self, T: int):
        """Snapshot the last ``T`` frames as an on-device gather (async) +
        host geometry, oldest first. Requires ``count >= T``."""
        if self.count < T:
            raise ValueError(f"ring holds {self.count} < {T} frames")
        dev = self.k._window(self.ring, jnp.int32(self.head), T)
        idx = (self.head - T + 1 + np.arange(T)) % self.k.R
        return dev, self.boxes[idx].copy(), self.lm5[idx].copy(), self.scale[idx].copy()
