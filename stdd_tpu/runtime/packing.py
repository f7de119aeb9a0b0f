"""Clip-batch packing shared by the streaming engine and the offline demo
path: per-clip uniform downscale into fixed-size zero-padded buffers with
boxes/landmarks rescaled to match (the similarity fit absorbs a uniform
scale exactly). Uses the native C++ area-resize when built."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _get(e, k):
    return e[k] if isinstance(e, dict) else getattr(e, k)


def pow2_capacities(max_batch: int):
    """All batch capacities a dispatch group can ship: powers of two below
    ``max_batch`` plus ``max_batch`` itself (which need not be a power of
    two — a full batch always packs to exactly batch_clips). Partial batches
    pack to the next of these (StreamingEngine._dispatch_worker), so these
    are exactly the executable shapes to pre-compile."""
    caps, c = [], 1
    while c < max_batch:
        caps.append(c)
        c *= 2
    caps.append(max_batch)
    return tuple(caps)


def upload_format_of(scorer) -> str:
    """The pack format a scorer expects. Single source of truth for every
    pack call site; scorer facades must forward ``upload_format`` (the
    scorer itself also shape-checks its input, so a mismatch fails loudly
    rather than decoding garbage)."""
    return getattr(scorer, "upload_format", "rgb")


def _encode_slot_yuv420(e, rgb_slot: np.ndarray, s: float, out: np.ndarray):
    """Pack one entry through a reused RGB slot, then I420-encode into
    ``out`` [S*3//2, S]; → (scaled box, scaled lm5)."""
    import cv2

    rgb_slot[:] = 0
    box, lm5 = _pack_entry(e, rgb_slot, s)
    out[:] = cv2.cvtColor(rgb_slot, cv2.COLOR_RGB2YUV_I420)
    return box, lm5


def _area_resize_np(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Exact area-average downscale (cv2.INTER_AREA semantics) in pure
    numpy. Fractional source boxes are summed exactly by bilinear-sampling
    the integral image (which is piecewise bilinear for a piecewise-constant
    image, so the sampling is exact, not an approximation). Last-resort path
    only — cv2 and the native kernel are both faster."""
    h, w = img.shape[:2]
    a = img.astype(np.float64).reshape(h, w, -1)
    cs = np.zeros((h + 1, w + 1, a.shape[2]), np.float64)
    cs[1:, 1:] = a.cumsum(0).cumsum(1)
    ys = np.linspace(0.0, float(h), oh + 1)
    xs = np.linspace(0.0, float(w), ow + 1)

    def integral_at(y: np.ndarray, x: np.ndarray) -> np.ndarray:
        yi = np.minimum(np.floor(y).astype(int), h - 1) if h else np.zeros_like(y, int)
        xi = np.minimum(np.floor(x).astype(int), w - 1) if w else np.zeros_like(x, int)
        fy = (y - yi)[:, None, None]
        fx = (x - xi)[None, :, None]
        c00 = cs[yi][:, xi]
        c01 = cs[yi][:, xi + 1]
        c10 = cs[yi + 1][:, xi]
        c11 = cs[yi + 1][:, xi + 1]
        return (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
                + c10 * fy * (1 - fx) + c11 * fy * fx)

    F = integral_at(ys, xs)
    box = F[1:, 1:] - F[:-1, 1:] - F[1:, :-1] + F[:-1, :-1]
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    out = box / area[..., None]
    out = np.clip(np.rint(out), 0, 255).astype(img.dtype)
    return out.reshape((oh, ow) + img.shape[2:])


def _pack_entry(e, dst_slot: np.ndarray, s: float) -> Tuple[np.ndarray, np.ndarray]:
    """Write one entry's crop into a zero-padded S×S slot at uniform scale
    ``s``; → (scaled box, scaled lm5).

    cv2.INTER_AREA is the resize (it is the semantic anchor the native C++
    kernel is parity-tested against, and measured 3-4× FASTER than that
    kernel on the 1-core bench host: 2.9 ms vs 10.2 ms at 576²→224² — SIMD
    beats the fused-but-scalar loop; PERF.md "Dead ends"). The native kernel
    remains the no-cv2 fallback."""
    c = _get(e, "crop")
    if s < 1.0:
        try:
            import cv2
        except ImportError:  # pragma: no cover — cv2 is baked into the image
            from ..native import resize_area_pack

            if not resize_area_pack(c, dst_slot, s):
                # last resort (no cv2 AND no native .so): pure-numpy area
                # resize — slow but keeps the stream alive
                h, w = c.shape[:2]
                oh = min(max(1, int(h * s)), dst_slot.shape[0])
                ow = min(max(1, int(w * s)), dst_slot.shape[1])
                dst_slot[:oh, :ow] = _area_resize_np(c, oh, ow)
        else:
            h, w = c.shape[:2]
            oh = min(max(1, int(h * s)), dst_slot.shape[0])
            ow = min(max(1, int(w * s)), dst_slot.shape[1])
            dst_slot[:oh, :ow] = cv2.resize(
                c, (ow, oh), interpolation=cv2.INTER_AREA)
    else:
        h, w = c.shape[:2]
        dst_slot[:h, :w] = c
    return (np.asarray(_get(e, "big_box"), np.float32) * s,
            np.asarray(_get(e, "lm5"), np.float32) * s)


def pack_clip_batch(
    clips: Sequence[Sequence],       # per clip: items with .crop/.big_box/.lm5
                                      # attributes OR dicts with those keys
    batch_capacity: int,
    T: int,
    S: int,
    yuv420: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """→ (crops [B,T,S,S,3] u8, boxes [B,T,4] f32, lm5 [B,T,5,2] f32,
    valid [B] bool); short clips are padded by repeating the last frame
    (TEST2.py:358-363).

    ``yuv420=True`` packs each frame as a planar I420 image
    ``[B,T,S*3//2,S]`` instead — half the host→device bytes. Video-call
    frames arrive 4:2:0-subsampled from the codec anyway, so this loses
    nothing the transport hadn't already dropped; the scorer reconstructs
    RGB on device (``ClipScorer(upload_format="yuv420")``)."""
    if yuv420 and S % 4:
        raise ValueError("yuv420 packing needs S divisible by 4")
    crops = np.zeros(
        (batch_capacity, T) + ((S * 3 // 2, S) if yuv420 else (S, S, 3)), np.uint8
    )
    boxes = np.zeros((batch_capacity, T, 4), np.float32)
    lm5 = np.zeros((batch_capacity, T, 5, 2), np.float32)
    valid = np.zeros((batch_capacity,), bool)
    rgb_slot = np.zeros((S, S, 3), np.uint8) if yuv420 else None

    for bi, entries in enumerate(clips[:batch_capacity]):
        entries = list(entries)
        while len(entries) < T:
            entries = entries + [entries[-1]]
        max_dim = max(
            max(_get(e, "crop").shape[0], _get(e, "crop").shape[1]) for e in entries
        )
        s = min(1.0, S / float(max_dim))
        for ti, e in enumerate(entries[:T]):
            if yuv420:
                boxes[bi, ti], lm5[bi, ti] = _encode_slot_yuv420(
                    e, rgb_slot, s, crops[bi, ti]
                )
            else:
                boxes[bi, ti], lm5[bi, ti] = _pack_entry(e, crops[bi, ti], s)
        valid[bi] = True
    return crops, boxes, lm5, valid


def pack_track(
    entries: Sequence,        # per-frame items with .crop/.big_box/.lm5 (or dicts)
    S: int,
    yuv420: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack ONE track's full frame sequence into a device-ready buffer
    (→ frames [N,S,S,3] u8, boxes [N,4], lm5 [N,5,2]) with a single uniform
    scale for the whole track — feed to ``ClipScorer.score_dense`` so each
    frame is uploaded once and windows become on-device slices.
    ``yuv420=True`` emits planar I420 frames [N,S*3//2,S] (half the upload
    bytes; pair with ``ClipScorer(upload_format="yuv420")``)."""

    if yuv420 and S % 4:
        raise ValueError("yuv420 packing needs S divisible by 4")
    N = len(entries)
    frames = np.zeros((N,) + ((S * 3 // 2, S) if yuv420 else (S, S, 3)), np.uint8)
    boxes = np.zeros((N, 4), np.float32)
    lm5 = np.zeros((N, 5, 2), np.float32)
    max_dim = max(max(_get(e, "crop").shape[0], _get(e, "crop").shape[1]) for e in entries)
    s = min(1.0, S / float(max_dim))
    rgb_slot = np.zeros((S, S, 3), np.uint8) if yuv420 else None
    for i, e in enumerate(entries):
        if yuv420:
            boxes[i], lm5[i] = _encode_slot_yuv420(e, rgb_slot, s, frames[i])
        else:
            boxes[i], lm5[i] = _pack_entry(e, frames[i], s)
    return frames, boxes, lm5
