"""Clip-batch packing shared by the streaming engine and the offline demo
path: per-clip uniform downscale into fixed-size zero-padded buffers with
boxes/landmarks rescaled to match (the similarity fit absorbs a uniform
scale exactly). Uses the native C++ area-resize when built."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def pack_clip_batch(
    clips: Sequence[Sequence],       # per clip: items with .crop/.big_box/.lm5
                                      # attributes OR dicts with those keys
    batch_capacity: int,
    T: int,
    S: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """→ (crops [B,T,S,S,3] u8, boxes [B,T,4] f32, lm5 [B,T,5,2] f32,
    valid [B] bool); short clips are padded by repeating the last frame
    (TEST2.py:358-363)."""
    crops = np.zeros((batch_capacity, T, S, S, 3), np.uint8)
    boxes = np.zeros((batch_capacity, T, 4), np.float32)
    lm5 = np.zeros((batch_capacity, T, 5, 2), np.float32)
    valid = np.zeros((batch_capacity,), bool)

    def get(e, k):
        return e[k] if isinstance(e, dict) else getattr(e, k)

    for bi, entries in enumerate(clips[:batch_capacity]):
        entries = list(entries)
        while len(entries) < T:
            entries = entries + [entries[-1]]
        max_dim = max(
            max(get(e, "crop").shape[0], get(e, "crop").shape[1]) for e in entries
        )
        s = min(1.0, S / float(max_dim))
        for ti, e in enumerate(entries[:T]):
            c = get(e, "crop")
            if s < 1.0:
                from ..native import resize_area_pack

                if not resize_area_pack(c, crops[bi, ti], s):
                    from .engine import _resize_area

                    c2 = _resize_area(c, s)
                    h, w = c2.shape[:2]
                    crops[bi, ti, :h, :w] = c2
            else:
                h, w = c.shape[:2]
                crops[bi, ti, :h, :w] = c
            boxes[bi, ti] = np.asarray(get(e, "big_box"), np.float32) * s
            lm5[bi, ti] = np.asarray(get(e, "lm5"), np.float32) * s
        valid[bi] = True
    return crops, boxes, lm5, valid


def pack_track(
    entries: Sequence,        # per-frame items with .crop/.big_box/.lm5 (or dicts)
    S: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack ONE track's full frame sequence into a device-ready buffer
    (→ frames [N,S,S,3] u8, boxes [N,4], lm5 [N,5,2]) with a single uniform
    scale for the whole track — feed to ``ClipScorer.score_dense`` so each
    frame is uploaded once and windows become on-device slices."""

    def get(e, k):
        return e[k] if isinstance(e, dict) else getattr(e, k)

    N = len(entries)
    frames = np.zeros((N, S, S, 3), np.uint8)
    boxes = np.zeros((N, 4), np.float32)
    lm5 = np.zeros((N, 5, 2), np.float32)
    max_dim = max(max(get(e, "crop").shape[0], get(e, "crop").shape[1]) for e in entries)
    s = min(1.0, S / float(max_dim))
    for i, e in enumerate(entries):
        c = get(e, "crop")
        if s < 1.0:
            from ..native import resize_area_pack

            if not resize_area_pack(c, frames[i], s):
                from .engine import _resize_area

                c2 = _resize_area(c, s)
                h, w = c2.shape[:2]
                frames[i, :h, :w] = c2
        else:
            h, w = c.shape[:2]
            frames[i, :h, :w] = c
        boxes[i] = np.asarray(get(e, "big_box"), np.float32) * s
        lm5[i] = np.asarray(get(e, "lm5"), np.float32) * s
    return frames, boxes, lm5
