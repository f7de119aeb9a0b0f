"""Fixed-shape greedy NMS and IoU matrices — TPU-native (static shapes).

Replaces cv2.dnn.NMSBoxes (used inside cv2.FaceDetectorYN, reference
``preprocessing/yunet/yunet.py``) and the pure-NumPy ``py_cpu_nms``
(reference ``test_tools/ct/detection/alignment.py:313``). All arrays are
fixed-capacity with validity masks so everything jits.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def iou_matrix_xywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for [N,4]/[M,4] boxes in (x, y, w, h). Matches the integer-
    free float IoU of cv2.dnn.NMSBoxes."""
    ax1, ay1 = a[:, 0], a[:, 1]
    ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx1, by1 = b[:, 0], b[:, 1]
    bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix1 = jnp.maximum(ax1[:, None], bx1[None, :])
    iy1 = jnp.maximum(ay1[:, None], by1[None, :])
    ix2 = jnp.minimum(ax2[:, None], bx2[None, :])
    iy2 = jnp.minimum(ay2[:, None], by2[None, :])
    iw = jnp.maximum(ix2 - ix1, 0.0)
    ih = jnp.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    area_a = jnp.maximum(a[:, 2], 0.0) * jnp.maximum(a[:, 3], 0.0)
    area_b = jnp.maximum(b[:, 2], 0.0) * jnp.maximum(b[:, 3], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_matrix_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for (x1, y1, x2, y2) boxes — ByteTrack's ``ious``
    convention (reference ByteTrack/matching.py:97 uses +1 pixel areas; that
    variant lives in stdd_tpu/track/matching.py)."""
    aw = jnp.stack([a[:, 0], a[:, 1], a[:, 2] - a[:, 0], a[:, 3] - a[:, 1]], axis=1)
    bw = jnp.stack([b[:, 0], b[:, 1], b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1)
    return iou_matrix_xywh(aw, bw)


@partial(jax.jit, static_argnames=("max_out", "plus1"))
def nms_fixed(
    boxes: jnp.ndarray,     # [N, 4] (x, y, w, h)
    scores: jnp.ndarray,    # [N]
    iou_threshold: float,
    score_threshold: float,
    max_out: int,
    plus1: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a fixed output capacity.

    Returns ``(keep_idx [max_out] int32, keep_mask [max_out] bool)`` —
    indices of survivors in score order, padded with 0 where mask is False.
    Matches cv2.dnn.NMSBoxes: score filter → greedy IoU suppression.
    ``plus1`` switches to py_cpu_nms's integer-pixel convention
    (alignment.py:313: areas (w+1)(h+1), inter width +1) — for small boxes
    the IoU differs by several percent, flipping near-threshold pairs.
    """
    n = boxes.shape[0]
    alive = scores > score_threshold
    if plus1:
        x1, y1 = boxes[:, 0], boxes[:, 1]
        x2, y2 = boxes[:, 0] + boxes[:, 2], boxes[:, 1] + boxes[:, 3]
        ix1 = jnp.maximum(x1[:, None], x1[None, :])
        iy1 = jnp.maximum(y1[:, None], y1[None, :])
        ix2 = jnp.minimum(x2[:, None], x2[None, :])
        iy2 = jnp.minimum(y2[:, None], y2[None, :])
        inter = jnp.maximum(ix2 - ix1 + 1.0, 0.0) * jnp.maximum(iy2 - iy1 + 1.0, 0.0)
        area = (boxes[:, 2] + 1.0) * (boxes[:, 3] + 1.0)
        union = area[:, None] + area[None, :] - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
    else:
        iou = iou_matrix_xywh(boxes, boxes)

    def body(state, _):
        alive, = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        # suppress overlaps with the winner (including itself)
        suppress = iou[best] > iou_threshold
        new_alive = alive & ~suppress & (jnp.arange(n) != best)
        new_alive = jnp.where(ok, new_alive, alive)
        return (new_alive,), (jnp.where(ok, best, 0).astype(jnp.int32), ok)

    (_,), (idx, mask) = jax.lax.scan(body, (alive,), None, length=max_out)
    return idx, mask
