"""Label-agnostic clip degradations for robustness fine-tuning.

Port of the reference's degradation pipeline
(``dualrun/data/dataset_regen.py:211`` _degrade_clip and helpers): JPEG
recompression, down-up scaling, off-center crop, motion blur, gaussian
noise, grayscale, letterbox, gamma/contrast jitter, frame drops. Host-side
cv2/numpy — these run in the input pipeline, not on device.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import numpy as np


def jpeg_recompress(img: np.ndarray, quality: int) -> np.ndarray:
    import cv2

    ok, enc = cv2.imencode(".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)])
    if not ok:
        return img
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def down_up(img: np.ndarray, scale: float) -> np.ndarray:
    import cv2

    if scale >= 0.999:
        return img
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(1, int(w * scale)), max(1, int(h * scale))),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)


def offcenter_crop(img: np.ndarray, max_frac: float, rng: random.Random) -> np.ndarray:
    import cv2

    if max_frac <= 0:
        return img
    h, w = img.shape[:2]
    dx = int(rng.uniform(-max_frac, max_frac) * w)
    dy = int(rng.uniform(-max_frac, max_frac) * h)
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (w, h), borderMode=cv2.BORDER_REPLICATE)


def motion_blur(img: np.ndarray, k: int) -> np.ndarray:
    import cv2

    if k < 3:
        return img
    kernel = np.zeros((k, k), np.float32)
    kernel[k // 2, :] = 1.0 / k
    return cv2.filter2D(img, -1, kernel)


def grayscale(img: np.ndarray) -> np.ndarray:
    import cv2

    g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)


def gauss_noise(img: np.ndarray, sigma: float, rng: np.random.RandomState) -> np.ndarray:
    noise = rng.randn(*img.shape) * sigma
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def gamma_contrast(img: np.ndarray, rng: random.Random) -> np.ndarray:
    gamma = rng.uniform(0.7, 1.4)
    alpha = rng.uniform(0.8, 1.2)
    x = img.astype(np.float32) / 255.0
    x = np.clip(alpha * (x ** gamma), 0, 1)
    return (x * 255).astype(np.uint8)


def letterbox(img: np.ndarray, rng: random.Random) -> np.ndarray:
    h, w = img.shape[:2]
    bar = int(rng.uniform(0.05, 0.15) * h)
    out = img.copy()
    out[:bar] = 0
    out[h - bar:] = 0
    return out


class ClipDegrader:
    """Randomized per-clip degradation chain (dataset_regen.py:211)."""

    def __init__(
        self,
        jpeg_q: Tuple[int, int] = (30, 85),
        scale: Tuple[float, float] = (0.5, 1.0),
        mblur_k: Tuple[int, int] = (0, 7),
        offcenter: float = 0.08,
        p_grayscale: float = 0.1,
        p_gauss_noise: float = 0.2,
        gauss_sigma: float = 6.0,
        p_frame_drop: float = 0.05,
        p_letterbox: float = 0.1,
        p_gamma_contrast: float = 0.3,
        seed: int = 0,
    ):
        self.jpeg_q = jpeg_q
        self.scale = scale
        self.mblur_k = mblur_k
        self.offcenter = offcenter
        self.p_grayscale = p_grayscale
        self.p_gauss_noise = p_gauss_noise
        self.gauss_sigma = gauss_sigma
        self.p_frame_drop = p_frame_drop
        self.p_letterbox = p_letterbox
        self.p_gamma_contrast = p_gamma_contrast
        self.rng = random.Random(seed)
        self.nprng = np.random.RandomState(seed)

    def __call__(self, frames: Sequence[np.ndarray]) -> List[np.ndarray]:
        rng = self.rng
        q = rng.randint(*self.jpeg_q)
        s = rng.uniform(*self.scale)
        mb_choices = [k for k in range(max(3, self.mblur_k[0] | 1), self.mblur_k[1] + 1, 2)]
        mb = rng.choice(mb_choices) if (self.mblur_k[1] >= 3 and mb_choices) else 0
        out: List[np.ndarray] = []
        for im in frames:
            im2 = im
            if rng.random() < self.p_letterbox:
                im2 = letterbox(im2, rng)
            if rng.random() < self.p_gamma_contrast:
                im2 = gamma_contrast(im2, rng)
            im2 = offcenter_crop(im2, self.offcenter, rng)
            im2 = down_up(im2, s)
            if mb > 0 and rng.random() < 0.6:
                im2 = motion_blur(im2, mb)
            if rng.random() < self.p_grayscale:
                im2 = grayscale(im2)
            if rng.random() < self.p_gauss_noise:
                im2 = gauss_noise(im2, self.gauss_sigma, self.nprng)
            if rng.random() < self.p_frame_drop and len(out) >= max(1, len(frames) // 6):
                continue
            im2 = jpeg_recompress(im2, q)
            out.append(im2)
        return out if out else list(frames)
