"""Pluggable frame sources for the live application.

The reference's capture layer is Windows-only (PrintWindow/BitBlt window
grabs in ``test/win_capture.py``, mss screen tiles + largest-tile heuristics
in ``test/capture_tile.py``). Here the capture surface is a small generator
protocol — ``iter_frames() -> BGR uint8 [H, W, 3]`` — with portable
implementations (video file, webcam, synthetic) plus the reference's
largest-tile picker re-implemented platform-independently so a screen-capture
backend can slot in where available.
"""

from __future__ import annotations

import time
from typing import Callable, Generator, Iterable, Iterator, Optional, Tuple

import numpy as np

FrameIter = Iterator[np.ndarray]


def iter_video_file(path: str, loop: bool = False, max_frames: Optional[int] = None) -> FrameIter:
    """Frames from a video file (the offline stand-in for window capture)."""
    import cv2

    n = 0
    while True:
        cap = cv2.VideoCapture(path)
        n_this_pass = 0
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield frame
                n += 1
                n_this_pass += 1
                if max_frames is not None and n >= max_frames:
                    return
        finally:
            cap.release()
        if n_this_pass == 0:
            # unreadable/empty source: with loop=True this would otherwise
            # busy-spin reopening the capture forever
            raise RuntimeError(f"no frames decodable from {path!r}")
        if not loop:
            return


def iter_webcam(index: int = 0, max_frames: Optional[int] = None) -> FrameIter:
    import cv2

    cap = cv2.VideoCapture(index)
    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            yield frame
            n += 1
            if max_frames is not None and n >= max_frames:
                return
    finally:
        cap.release()


def iter_synthetic(
    n_frames: int, hw: Tuple[int, int] = (720, 1280), seed: int = 0,
    draw: Optional[Callable[[np.ndarray, int], None]] = None,
) -> FrameIter:
    """Deterministic synthetic stream for tests/benches."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, hw + (3,), np.uint8)
    for i in range(n_frames):
        frame = base.copy()
        if draw is not None:
            draw(frame, i)
        yield frame


def iter_screen(
    display: Optional[str] = None,
    window_title: Optional[Tuple[str, ...]] = None,
    region: Optional[Tuple[int, int, int, int]] = None,
    target_hz: float = 8.0,
    max_frames: Optional[int] = None,
) -> FrameIter:
    """Live X11 screen/window capture (Linux analogue of the reference's
    ``iter_window_frames``/``iter_teams_frames``, win_capture.py:42,:121).
    See :mod:`stdd_tpu.runtime.x11_capture`."""
    from .x11_capture import iter_screen_frames

    return iter_screen_frames(
        display=display, window_title=window_title, region=region,
        target_hz=target_hz, max_frames=max_frames,
    )


def throttle(frames: Iterable[np.ndarray], target_hz: float) -> FrameIter:
    """Rate-limit a source to a target frequency (run_loop's pacing,
    app_realtime.py:96)."""
    period = 1.0 / max(target_hz, 1e-6)
    last = 0.0
    for f in frames:
        now = time.perf_counter()
        wait = period - (now - last)
        if wait > 0:
            time.sleep(wait)
        last = time.perf_counter()
        yield f


class LargestTilePicker:
    """Pick the dominant video tile in a grid-layout call UI
    (capture_tile.py:55): edge-density segmentation into rectangles, choose
    the largest; fall back to the motion bounding box."""

    def __init__(self, min_area_frac: float = 0.08, motion_thresh: float = 12.0):
        self.min_area_frac = min_area_frac
        self.motion_thresh = motion_thresh
        self._prev: Optional[np.ndarray] = None

    def pick(self, frame_bgr: np.ndarray) -> Tuple[int, int, int, int]:
        import cv2

        H, W = frame_bgr.shape[:2]
        gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
        edges = cv2.Canny(gray, 60, 160)
        edges = cv2.dilate(edges, np.ones((3, 3), np.uint8))
        contours, _ = cv2.findContours(255 - edges, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        best, best_area = None, 0
        for c in contours:
            x, y, w, h = cv2.boundingRect(c)
            area = w * h
            if area > best_area and area >= self.min_area_frac * H * W:
                best, best_area = (x, y, x + w, y + h), area
        # refresh the motion reference on EVERY call — a contour hit that
        # skipped it would leave the fallback diffing against a frame from
        # minutes ago, flagging the whole screen as motion
        prev, self._prev = self._prev, gray
        if best is not None:
            return best
        # motion fallback
        if prev is not None:
            diff = cv2.absdiff(gray, prev)
            ys, xs = np.where(diff > self.motion_thresh)
            if len(xs) > 100:
                return int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())
        return 0, 0, W, H


def iter_roi(frames: Iterable[np.ndarray], picker: Optional[LargestTilePicker] = None,
             repick_every: int = 30) -> FrameIter:
    """Crop each frame to the picked tile (capture_tile.py:147 iter_roi_frames)."""
    picker = picker or LargestTilePicker()
    roi = None
    for i, f in enumerate(frames):
        if roi is None or i % repick_every == 0:
            roi = picker.pick(f)
        x1, y1, x2, y2 = roi
        yield f[y1:y2, x1:x2]
