"""Video IO and detection post-processing helpers (reference
``test_tools/ct/detection/utils.py`` + ``__init__.py``)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def grab_all_frames(path: str, max_size: int, cvt: bool = False) -> List[np.ndarray]:
    """Decode up to ``max_size`` frames; ``cvt`` flips BGR→RGB
    (detection/utils.py:17)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames: List[np.ndarray] = []
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame[..., ::-1].copy() if cvt else frame)
            if len(frames) == max_size:
                break
    finally:
        cap.release()
    return frames


def sample_chunks(items: Sequence, n: int, step: Optional[int] = None) -> List:
    """Fixed-size windows at a stride (detection/utils.py:13)."""
    step = step or n
    return [items[i : i + n] for i in range(0, len(items), step) if i + n <= len(items)]


def get_clips_uniform(path: str, count: int, clip_size: int) -> List[List[np.ndarray]]:
    """``count`` uniformly-spaced ``clip_size``-frame clips, decoding only the
    needed frames via grab/retrieve (detection/utils.py:33)."""
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        max_clips = n_frames + 1 - clip_size
        if max_clips <= 0:
            return []
        count = min(count, max_clips)
        starts = np.linspace(0, max_clips - 1, count, endpoint=True, dtype=int)
        all_idx = [list(range(s, s + clip_size)) for s in starts]
        valid = {i for clip in all_idx for i in clip}
        frames: Dict[int, np.ndarray] = {}
        for idx in range(max(valid) + 1):
            if not cap.grab():
                # a failed grab does not advance the decoder: continuing
                # would shift every later frame's index by one silently —
                # stop here and let short clips be dropped below
                break
            if idx in valid:
                ok, frame = cap.retrieve()
                if ok and frame is not None:
                    frames[idx] = frame
        return [
            [frames[i] for i in clip if i in frames]
            for clip in all_idx
            if all(i in frames for i in clip)
        ]
    finally:
        cap.release()


def weak_check(detect_res: Sequence[Sequence]) -> bool:
    """At least ~0.75 faces per frame on average (test_tools/utils.py:9)."""
    return sum(len(faces) for faces in detect_res) > len(detect_res) * 0.75


def _bounded(v, lo, hi) -> bool:
    return lo <= v <= hi


def check_valid_face(face, w: int, h: int) -> bool:
    """Box/landmarks inside the frame (detection/__init__.py:10)."""
    box, pts = face[0], face[1]
    if box[0] > box[2] or box[1] > box[3]:
        return False
    for idx, bound in zip(range(4), (w, h, w, h)):
        if not _bounded(box[idx], 0, bound):
            return False
    for p in pts:
        if not (_bounded(p[0], 0, w) and _bounded(p[1], 0, h)):
            return False
    return True


def get_valid_faces(detect_results, w: int, h: int, scale: float = 1.0):
    """Rescale detections to frame coords and drop out-of-frame faces
    (detection/__init__.py:27 post_detect)."""
    out = []
    for frame_faces in detect_results:
        kept = []
        for box, lm, score in frame_faces:
            face = (np.asarray(box) * scale, np.asarray(lm) * scale, score)
            if check_valid_face(face, w=w, h=h):
                kept.append(face)
        out.append(kept)
    return out


def scale_detect(detector, images: Sequence[np.ndarray], max_res: int = 1920):
    """Resolution-capped detection (detection/__init__.py:41
    FaceDetector.scale_detect): cap the long side at ``max_res``, detect at
    half that resolution, rescale results back.

    ``detector(frames) -> per-frame [(box, lm5, score)]`` at the detect
    resolution.
    """
    import cv2

    h, w = images[0].shape[:2]
    init_scale = max(h, w) / max_res if max(h, w) > max_res else 1
    resize_scale = 2 * init_scale
    rw, rh = int(w / resize_scale), int(h / resize_scale)
    small = [cv2.resize(f, (rw, rh)) for f in images]
    return get_valid_faces(detector(small), w=w, h=h, scale=resize_scale)
