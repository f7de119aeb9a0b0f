"""SCRFD face detector on XLA (the second ONNX detector the reference ships,
``altfreezing/checkpoints/scrfd_2.5g_bnkps.onnx``).

Anchor-free decode (SCRFD, arXiv:2105.04714): per stride s ∈ {8, 16, 32}
each cell carries 2 anchors at its center; boxes are center±distance·s, five
keypoints likewise. Raw heads run through the shared ONNX→JAX executor
(5e-6 parity with cv2.dnn); postprocess uses the fixed-shape device NMS.
Output rows match YuNet's ``(x, y, w, h, 5×(lx, ly), score)`` 15-column
convention so the tracker/engine consume either detector unchanged.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_fixed
from .onnx_jax import OnnxModule

SCRFD_STRIDES = (8, 16, 32)
NUM_ANCHORS = 2
DEFAULT_MODEL = "/root/reference/altfreezing/checkpoints/scrfd_2.5g_bnkps.onnx"

# output tensor names by (kind, stride) for the shipped 2.5g_bnkps export
_OUT = {
    ("score", 8): "446", ("score", 16): "466", ("score", 32): "486",
    ("bbox", 8): "449", ("bbox", 16): "469", ("bbox", 32): "489",
    ("kps", 8): "452", ("kps", 16): "472", ("kps", 32): "492",
}


class SCRFDDetector:
    def __init__(
        self,
        model_path: str = DEFAULT_MODEL,
        input_size: Tuple[int, int] = (320, 320),   # (w, h)
        conf_threshold: float = 0.5,
        nms_threshold: float = 0.4,
        top_k: int = 128,
    ):
        self.module = OnnxModule.from_file(model_path)
        self.input_size = input_size
        self.conf_threshold = float(conf_threshold)
        self.nms_threshold = float(nms_threshold)
        self.top_k = int(top_k)
        self._detect = jax.jit(self._detect_impl)

    def _centers(self, w: int, h: int, s: int) -> jnp.ndarray:
        gw, gh = w // s, h // s
        cx = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1) * s
        cy = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0) * s
        c = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=1)       # [gh*gw, 2]
        return jnp.repeat(c, NUM_ANCHORS, axis=0)                      # [N, 2]

    def _detect_impl(self, frames_bgr: jnp.ndarray):
        B, H, W, _ = frames_bgr.shape
        # SCRFD preprocess: (x − 127.5) / 128, RGB order
        x = (frames_bgr[..., ::-1].astype(jnp.float32) - 127.5) / 128.0
        blob = x.transpose(0, 3, 1, 2)

        def one(xi):
            outs = self.module(xi[None])
            boxes, scores, kps = [], [], []
            for s in SCRFD_STRIDES:
                sc = outs[_OUT[("score", s)]][:, 0]
                bb = outs[_OUT[("bbox", s)]] * s
                kk = outs[_OUT[("kps", s)]] * s
                c = self._centers(W, H, s)
                x1 = c[:, 0] - bb[:, 0]
                y1 = c[:, 1] - bb[:, 1]
                x2 = c[:, 0] + bb[:, 2]
                y2 = c[:, 1] + bb[:, 3]
                boxes.append(jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=1))
                scores.append(sc)
                lk = kk.reshape(-1, 5, 2) + c[:, None, :]
                kps.append(lk.reshape(-1, 10))
            boxes = jnp.concatenate(boxes)
            scores = jnp.concatenate(scores)
            kps = jnp.concatenate(kps)
            keep, mask = nms_fixed(
                boxes, scores, self.nms_threshold, self.conf_threshold, self.top_k
            )
            det = jnp.concatenate([boxes[keep], kps[keep], scores[keep, None]], axis=1)
            return jnp.where(mask[:, None], det, 0.0), mask

        return jax.vmap(one)(blob)

    def detect(self, frames_bgr) -> Tuple[jnp.ndarray, jnp.ndarray]:
        frames_bgr = jnp.asarray(frames_bgr)
        if frames_bgr.ndim == 3:
            frames_bgr = frames_bgr[None]
        return self._detect(frames_bgr)

    def detect_np(self, frame_bgr: np.ndarray) -> np.ndarray:
        dets, mask = self.detect(frame_bgr)
        return np.asarray(dets[0])[np.asarray(mask[0])]
