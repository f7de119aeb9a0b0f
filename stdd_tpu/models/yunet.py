"""YuNet face detector, TPU-native.

The reference executes ``face_detection_yunet_2023mar.onnx`` through
cv2.FaceDetectorYN (``preprocessing/yunet/yunet.py:47``; singleton service at
``test/af_realtime.py:123`` / ``TEST2.py:214``). Here the same weights run as
JAX/XLA convolutions (via :class:`~stdd_tpu.models.onnx_jax.OnnxModule`) with
the anchor-free decode and a fixed-shape greedy NMS fused into one jitted
function — detections come back as a padded ``[top_k, 15]`` tensor exactly
matching the reference's N×15 rows
``(x, y, w, h, 5×(lx, ly), score)``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .onnx_jax import OnnxModule
from ..ops.nms import nms_fixed

YUNET_STRIDES = (8, 16, 32)
DEFAULT_MODEL = "/root/reference/preprocessing/yunet/face_detection_yunet_2023mar.onnx"


class YuNetTPU:
    """Batched on-device YuNet.

    ``detect(frames_bgr)`` takes ``[B, H, W, 3] uint8`` (BGR, H/W divisible by
    32 — resize on host or with ``jax.image.resize`` beforehand) and returns
    ``(dets [B, top_k, 15] float32, mask [B, top_k] bool)``.
    """

    def __init__(
        self,
        model_path: str = DEFAULT_MODEL,
        input_size: Tuple[int, int] = (320, 320),  # (w, h) as in the reference
        conf_threshold: float = 0.6,
        nms_threshold: float = 0.3,
        top_k: int = 128,
    ):
        self.module = OnnxModule.from_file(model_path)
        self.input_size = tuple(input_size)
        self.conf_threshold = float(conf_threshold)
        self.nms_threshold = float(nms_threshold)
        self.top_k = int(top_k)
        self._detect = jax.jit(self._detect_impl)

    # -- decode (mirrors OpenCV FaceDetectorYNImpl::postProcess) -------------

    def _grid(self, w: int, h: int) -> Dict[int, Tuple[jnp.ndarray, jnp.ndarray]]:
        grids = {}
        for s in YUNET_STRIDES:
            gw, gh = w // s, h // s
            r = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0).reshape(-1)
            c = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1).reshape(-1)
            grids[s] = (c, r)
        return grids

    def _decode_one(self, outs: Dict[str, jnp.ndarray], w: int, h: int):
        grids = self._grid(w, h)
        boxes, scores, lmks = [], [], []
        for s in YUNET_STRIDES:
            cls = jnp.clip(outs[f"cls_{s}"][0, :, 0], 0.0, 1.0)
            obj = jnp.clip(outs[f"obj_{s}"][0, :, 0], 0.0, 1.0)
            score = jnp.sqrt(cls * obj)
            bbox = outs[f"bbox_{s}"][0]
            kps = outs[f"kps_{s}"][0]
            c, r = grids[s]
            cx = (c + bbox[:, 0]) * s
            cy = (r + bbox[:, 1]) * s
            bw = jnp.exp(bbox[:, 2]) * s
            bh = jnp.exp(bbox[:, 3]) * s
            x1 = cx - bw / 2
            y1 = cy - bh / 2
            lx = (kps[:, 0::2] + c[:, None]) * s
            ly = (kps[:, 1::2] + r[:, None]) * s
            boxes.append(jnp.stack([x1, y1, bw, bh], axis=1))
            scores.append(score)
            lmks.append(jnp.stack([lx, ly], axis=2).reshape(-1, 10))
        return (
            jnp.concatenate(boxes, 0),
            jnp.concatenate(scores, 0),
            jnp.concatenate(lmks, 0),
        )

    def _detect_impl(self, frames: jnp.ndarray):
        B, H, W, _ = frames.shape
        blob = frames.astype(jnp.float32).transpose(0, 3, 1, 2)  # NCHW, raw 0-255 BGR

        def one(x):
            outs = self.module(x[None])
            boxes, scores, lmks = self._decode_one(outs, W, H)
            keep, mask = nms_fixed(
                boxes, scores, self.nms_threshold, self.conf_threshold, self.top_k
            )
            det = jnp.concatenate(
                [boxes[keep], lmks[keep], scores[keep, None]], axis=1
            )  # [top_k, 15]
            return jnp.where(mask[:, None], det, 0.0), mask

        return jax.vmap(one)(blob)

    def detect(self, frames_bgr) -> Tuple[jnp.ndarray, jnp.ndarray]:
        frames_bgr = jnp.asarray(frames_bgr)
        if frames_bgr.ndim == 3:
            frames_bgr = frames_bgr[None]
        return self._detect(frames_bgr)

    def detect_np(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Single-frame convenience mirroring the reference ``YuNet.infer``
        (preprocessing/yunet/yunet.py:87): returns the valid N×15 rows."""
        dets, mask = self.detect(frame_bgr)
        d = np.asarray(dets[0])
        m = np.asarray(mask[0])
        return d[m]


def detect_scaled(det, frame_bgr: np.ndarray, det_size: int = 320) -> np.ndarray:
    """Fixed-size detection scaled back to frame coordinates: resize the
    frame to ``det_size``² (ONE XLA executable regardless of source
    resolution), detect, and rescale the [N, 15] rows' box + landmark
    columns to the original frame (the reference's resize-and-rescale
    detection block, TEST2.py:502 / preprocessing_parallel.py:246 — shared
    here by every CLI instead of five copies)."""
    import cv2

    if det_size % 32:
        # the ONNX graph's stride-8/16/32 grids require divisible inputs;
        # fail here with a clear message instead of a jit shape error
        raise ValueError(f"det_size must be a multiple of 32 (got {det_size})")
    H, W = frame_bgr.shape[:2]
    rows = det.detect_np(cv2.resize(frame_bgr, (det_size, det_size)))
    if rows.size:
        rows = rows.copy()
        rows[:, 0:14:2] *= W / det_size
        rows[:, 1:14:2] *= H / det_size
    return rows
