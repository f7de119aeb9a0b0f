"""Per-clip I3D feature dumping for RGB fusion (reference altfreezing/feature.py).

The reference wraps the classifier with a forward hook capturing penultimate
features (``AFModel`` at feature.py:92) and runs YuNet+ByteTrack+align per
video, saving ``npz`` files with features/logits/scores (``process_video``
:157) that feed ``DualEncoderRGB(from_features=True)``. Here the same flow
rides the streaming engine with a feature-capturing scorer facade.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


class FeatureCaptureScorer:
    """ClipScorer facade: scores clips AND records penultimate features in
    dispatch order (synchronous — feature dumping is an offline job)."""

    def __init__(self, scorer):
        self.scorer = scorer
        # forward the pack-format contract so the engine packs what the
        # wrapped scorer expects (see packing.upload_format_of)
        self.upload_format = getattr(scorer, "upload_format", "rgb")
        self.features: List[np.ndarray] = []
        self.logits: List[np.ndarray] = []

    def score_async(self, crops, boxes, lm5, valid, path: str = "auto"):
        # `path` (the engine's host-side warp routing hint) is accepted for
        # the ClipScorer contract but ignored: the feature-capture program
        # has no per-path variants, it always auto-routes internally.
        del path
        probs, logits, feats = self.scorer.score_with_features(crops, boxes, lm5, valid)
        n = int(np.sum(valid))
        self.features.append(feats[:n])
        self.logits.append(logits[:n])
        return probs

    def score(self, crops, boxes, lm5, valid, path: str = "auto"):
        return self.score_async(crops, boxes, lm5, valid, path=path)


def dump_video_features(
    scorer,
    frames_bgr: Sequence[np.ndarray],
    detect_fn: Callable,
    cfg=None,
    out_path: Optional[str] = None,
    **engine_kwargs,
) -> Dict[str, np.ndarray]:
    """Stream one video, capturing (tid, score, logit, feature) per clip.

    Returns / saves npz with ``feats [N, 2048]``, ``logits [N, C]``,
    ``scores [N]``, ``tids [N]`` (feature.py:157 process_video)."""
    from ..runtime.engine import StreamingEngine

    capture = FeatureCaptureScorer(scorer)
    # the facade has no score_windows (device-ring) program — and feature
    # dumping is an offline job where the host-packed path is the
    # throughput-optimal choice anyway, so pin it off rather than inherit
    # the engine's accelerator auto-default
    engine_kwargs.setdefault("device_resident", False)
    engine = StreamingEngine(capture, detect_fn, cfg=cfg, **engine_kwargs)
    order: List[Tuple[int, float]] = []
    for frame in frames_bgr:
        order.extend(engine.step(frame))
    order.extend(engine.flush())

    feats = np.concatenate(capture.features) if capture.features else np.zeros((0, 2048))
    logits = np.concatenate(capture.logits) if capture.logits else np.zeros((0, 1))
    n = min(len(order), len(feats))
    out = {
        "feats": feats[:n],
        "logits": logits[:n],
        "scores": np.asarray([p for _, p in order[:n]], np.float32),
        "tids": np.asarray([t for t, _ in order[:n]], np.int64),
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.savez(out_path, **out)
    return out


def load_feature_clips(paths: Sequence[str], T: int) -> Dict[str, np.ndarray]:
    """Stack dumped per-video npz files into [N, T, D] windows per track —
    the ``from_features=True`` input of DualEncoderRGB (dual_rgb.py:47)."""
    windows, tids, vids = [], [], []
    for vi, p in enumerate(paths):
        z = np.load(p)
        for tid in np.unique(z["tids"]):
            f = z["feats"][z["tids"] == tid]
            for s in range(0, len(f) - T + 1, T):
                windows.append(f[s : s + T])
                tids.append(tid)
                vids.append(vi)
    if not windows:
        return {"rgb": np.zeros((0, T, 2048), np.float32),
                "trk": np.zeros(0, np.int64), "vid": np.zeros(0, np.int64)}
    return {
        "rgb": np.stack(windows).astype(np.float32),
        "trk": np.asarray(tids), "vid": np.asarray(vids),
    }
