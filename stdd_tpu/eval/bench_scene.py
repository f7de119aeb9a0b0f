"""Synthetic multi-face call scene for the end-to-end benchmark.

Replaces round-2's synthetic detection rows (old bench.py:64-78): rendered
talking heads (``models.facemesh.render_faces`` — the same procedural
renderer the packaged landmarker was trained on) are composited into the
1080p frame and the REAL YuNet detections drive NMS → score filters →
ByteTrack. Nothing in the timed path is faked; reference analogue is the
per-frame detect/track flow of ``TEST2.py:502-556`` on real video.

Design constraints (tpu-rig): the host has ONE core, so all rendering and
resizing happens once at construction (a K-frame looping talking animation
per face, pre-rendered on device in fixed-size chunks → one XLA executable),
and per-frame work is a background memcpy plus sprite pastes.
"""

from __future__ import annotations

import numpy as np

_RENDER_CHUNK = 8          # fixed render batch → exactly one compiled shape
_RENDER_SIZE = 128         # native renderer resolution (upscaled at paste)


class BenchScene:
    """Deterministic talking-heads scene.

    ``frame(i)`` returns the BGR uint8 frame for global frame index ``i``;
    ``detect(det, frame)`` runs the real fixed-320 detection path and
    returns the raw [N, 15] rows (box, 5-pt landmarks, score).
    """

    def __init__(self, frame_hw, n_faces: int = 1, seed: int = 0,
                 face_px: int = 288, loop: int = 24, expr_order=None):
        import cv2
        import jax
        import jax.numpy as jnp

        from stdd_tpu.models.facemesh import render_faces

        H, W = frame_hw
        self.frame_hw = frame_hw
        self.n_faces = n_faces
        m = 40
        cols = int(np.ceil(np.sqrt(n_faces)))
        rows_n = int(np.ceil(n_faces / cols))
        # clamp so the face grid fits small (CPU-fallback) frames
        face_px = min(face_px, (H - 2 * m) // rows_n, (W - 2 * m) // cols)
        self.face_px = face_px
        self.loop = loop
        rng = np.random.RandomState(seed)

        # --- talking-loop parameters: fixed style per face, theta animated -
        # Skin stays on the natural manifold (brightness × warmth, preserving
        # the renderer's R>G>B base hue): YuNet's real-face weights reject
        # green/yellow skin, measured — free-form style[:3] jitter made 3 of
        # 4 faces undetectable at any confidence.
        phase = rng.uniform(0, 2 * np.pi, n_faces)
        styles = np.zeros((n_faces, 8), np.float32)
        bright = rng.uniform(-0.5, 0.45, n_faces)
        warmth = rng.uniform(0.0, 0.4, n_faces)
        styles[:, 0] = bright + 0.3 * warmth
        styles[:, 1] = bright
        styles[:, 2] = bright - 0.3 * warmth
        styles[:, 3:6] = rng.uniform(-0.6, 0.6, (n_faces, 3))   # background
        styles[:, 6] = rng.uniform(-0.3, 0.3, n_faces)          # lighting
        styles[:, 7] = rng.uniform(-0.4, 0.4, n_faces)          # lip tone
        rigid = np.zeros((n_faces, loop, 4), np.float32)
        rigid[..., 1] = 0.05 * np.sin(
            2 * np.pi * np.arange(loop) / loop + phase[:, None])  # head sway
        theta = np.zeros((n_faces, loop, 6), np.float32)
        t = 2 * np.pi * np.arange(loop) / loop
        theta[..., 4] = 0.35 + 0.35 * np.sin(t + phase[:, None])  # mouth_open
        theta[..., 5] = 0.25 * np.sin(0.5 * t + phase[:, None])   # smile
        theta[..., 2] = 0.2 * np.sin(t[None] * 2 + phase[:, None])  # brow_l
        theta[..., 3] = theta[..., 2]

        # --- pre-render on device in ONE compiled shape, fetch once --------
        flat_r = rigid.reshape(-1, 4)
        flat_t = theta.reshape(-1, 6)
        flat_s = np.repeat(styles, loop, axis=0)
        n = flat_r.shape[0]
        pad = (-n) % _RENDER_CHUNK
        if pad:
            flat_r = np.concatenate([flat_r, flat_r[:pad]])
            flat_t = np.concatenate([flat_t, flat_t[:pad]])
            flat_s = np.concatenate([flat_s, flat_s[:pad]])
        render = jax.jit(lambda r, th, s: render_faces(r, th, s, size=_RENDER_SIZE))
        tiles = []
        for c in range(0, flat_r.shape[0], _RENDER_CHUNK):
            sl = slice(c, c + _RENDER_CHUNK)
            tiles.append(np.asarray(render(
                jnp.asarray(flat_r[sl]), jnp.asarray(flat_t[sl]),
                jnp.asarray(flat_s[sl]))))
        tiles = np.concatenate(tiles)[:n]                  # [F*loop, 128, 128, 3]
        tiles = (tiles * 255).astype(np.uint8)[..., ::-1]  # RGB → BGR
        self.sprites = np.stack([                           # [F, loop, px, px, 3]
            np.stack([cv2.resize(tl, (face_px, face_px),
                                 interpolation=cv2.INTER_LINEAR)
                      for tl in tiles[f * loop:(f + 1) * loop]])
            for f in range(n_faces)])

        # --- static background: smooth gradient + low-frequency clutter ----
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        bg = 90 + 50 * xx / W + 30 * yy / H
        low = cv2.resize(rng.uniform(-25, 25, (18, 32)).astype(np.float32), (W, H),
                         interpolation=cv2.INTER_CUBIC)
        self.bg = np.clip(bg[..., None] + low[..., None]
                          + rng.uniform(-12, 12, 3), 0, 255).astype(np.uint8)
        self.bg = np.ascontiguousarray(np.broadcast_to(self.bg, (H, W, 3)))

        # --- motion: grid starts, slow drift, bounce at margins ------------
        self.pos0 = np.empty((n_faces, 2), np.float64)
        for f in range(n_faces):
            cx = (f % cols + 0.5) / cols * (W - face_px - 2 * m) + m
            cy = (f // cols + 0.5) / rows_n * (H - face_px - 2 * m) + m
            self.pos0[f] = (cx, cy)
        self.vel = rng.uniform(-1.8, 1.8, (n_faces, 2))
        self.lo = np.array([m, m], np.float64)
        self.hi = np.array([W - face_px - m, H - face_px - m], np.float64)

        # --- reusable canvas pool: frame() restores the previous sprites'
        # rects from the background and pastes the new ones, instead of
        # memcpy-ing the whole 6 MB frame (1.5 ms/frame on the 1-core host —
        # ~16% of the whole frame budget at 108 fps). A returned frame stays
        # valid for the next _N_CANVAS-1 frame() calls; the engine's only
        # deferred reader is the AsyncDetector thread, whose read completes
        # before the next detect-cadence await (≤ detect_every < _N_CANVAS).
        self._N_CANVAS = 8
        self._canvases: list = []
        self._dirty: list = []   # per-canvas [(y, x)] of stale sprite pastes
        self._call_no = 0

        # Optional temporal scrambling of the talking loop (the synthetic
        # "deepfake" used by scripts/run_synth_e2e.py): a permutation of
        # range(loop) applied to the EXPRESSION index only. Head position
        # stays smooth in ``i`` (detection/tracking see identical geometry),
        # while adjacent frames jump between expression states — the
        # temporal-incoherence cue the I3D's temporal kernels exist to catch
        # (the video-domain analogue of the temporal-shuffle separable data
        # in scripts/measure_train_epoch.py).
        if expr_order is None:
            self._expr = np.arange(loop)
        else:
            self._expr = np.asarray(expr_order, np.int64)
            if (self._expr.shape != (loop,)
                    or not np.array_equal(np.sort(self._expr), np.arange(loop))):
                raise ValueError(
                    f"expr_order must be a permutation of range({loop})")

    def _positions(self, i: int) -> np.ndarray:
        # reflective (triangle-wave) bounce — deterministic in i, no state.
        # A degenerate axis (face fills the frame dimension: hi <= lo) pins
        # the face at lo instead of dividing by a zero span.
        span = self.hi - self.lo
        ok = span > 1e-9
        raw = self.pos0 - self.lo + self.vel * i
        tri = np.abs((raw / np.where(ok, span, 1.0)) % 2.0 - 1.0)
        return np.where(ok, self.lo + (1.0 - tri) * span, self.lo)

    def frame(self, i: int, copy: bool = False) -> np.ndarray:
        """BGR frame for index ``i`` (content deterministic in ``i``).

        The returned buffer is reused after ``_N_CANVAS - 1`` further calls;
        pass ``copy=True`` for an independent array."""
        px = self.face_px
        pos = self._positions(i).astype(int)
        if len(self._canvases) < self._N_CANVAS:
            self._canvases.append(self.bg.copy())
            self._dirty.append([])
            out = self._canvases[-1]
            dirty = self._dirty[-1]
        else:
            c = self._call_no % self._N_CANVAS
            out, dirty = self._canvases[c], self._dirty[c]
            # restore each stale sprite rect from the background, MINUS the
            # same face's incoming paste rect (which overwrites it anyway) —
            # faces drift ≤ vel·_N_CANVAS px between reuses, so only a thin
            # L-shaped sliver actually needs the memcpy
            for (f, y, x) in dirty:
                nx, ny = int(pos[f, 0]), int(pos[f, 1])
                iy0, iy1 = max(y, ny), min(y + px, ny + px)
                ix0, ix1 = max(x, nx), min(x + px, nx + px)
                if iy0 >= iy1 or ix0 >= ix1:          # no overlap: full rect
                    out[y:y + px, x:x + px] = self.bg[y:y + px, x:x + px]
                    continue
                if y < iy0:
                    out[y:iy0, x:x + px] = self.bg[y:iy0, x:x + px]
                if iy1 < y + px:
                    out[iy1:y + px, x:x + px] = self.bg[iy1:y + px, x:x + px]
                if x < ix0:
                    out[iy0:iy1, x:ix0] = self.bg[iy0:iy1, x:ix0]
                if ix1 < x + px:
                    out[iy0:iy1, ix1:x + px] = self.bg[iy0:iy1, ix1:x + px]
            dirty.clear()
        self._call_no += 1
        k = int(self._expr[i % self.loop])
        for f, (x, y) in enumerate(pos):
            out[y:y + px, x:x + px] = self.sprites[f, k]
            dirty.append((f, int(y), int(x)))
        return out.copy() if copy else out

    def detect(self, det, frame_bgr: np.ndarray) -> np.ndarray:
        from stdd_tpu.models.yunet import detect_scaled

        return detect_scaled(det, frame_bgr, det_size=320)
