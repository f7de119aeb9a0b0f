"""Image-clip dataset for I3D/AltFreezing training.

The reference trains its 3D-CNN from FTCN's LMDB rigs (not shipped); here
clips come straight from the preprocessing tree (``images.npy`` written by
:mod:`stdd_tpu.data.preprocess`), with window stitching to reach the model's
clip length and the pixel-space training augmentations of the FTCN recipe
(``setting/ftcn_tt.yaml`` aug block: color jitter, gaussian blur/noise,
JPEG recompression, erase) implemented via :mod:`stdd_tpu.data.degrade`.
"""

from __future__ import annotations

import glob
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .dataset import ids_from_dir, infer_tech_from_path, label_from_dir
from .preprocess import CLIP_STEP


class I3DClipDataset:
    def __init__(
        self,
        root_dir: Optional[str] = None,
        clip_dirs: Optional[Sequence[str]] = None,
        T: int = 32,
        is_train: bool = False,
        color_jitter: float = 0.4,
        p_gauss_blur: float = 0.05,
        p_gauss_noise: float = 0.1,
        p_jpeg: float = 0.3,
        p_erase: float = 0.3,
        geo_jitter: float = 0.0,   # clip-consistent similarity jitter; OPT-IN (0 off):
        # full-scale capstone A/B left it unproven (docs/PERF.md round-5
        # serving-gap table) — enable deliberately, not by default
        seed: int = 0,
        clip_step: Optional[int] = None,  # writer stride; None = CLIP_STEP
    ):
        if clip_dirs is None:
            assert root_dir
            clip_dirs = sorted(
                glob.glob(os.path.join(root_dir, "**", "track_*", "clip_*"),
                          recursive=True)
            )
        # group consecutive clips per track to stitch up to T frames
        buckets: Dict[str, List[Tuple[int, str]]] = {}
        for d in clip_dirs:
            if not os.path.isfile(os.path.join(d, "images.npy")):
                continue
            segs = d.replace("\\", "/").split("/")
            track = next((s for s in segs if s.startswith("track_")), None)
            clip_s = next((s for s in segs if s.startswith("clip_")), None)
            if not track or not clip_s:
                continue
            try:
                ci = int(clip_s.split("_")[-1])
            except ValueError:
                ci = -1
            key = "/".join(segs[: segs.index(track) + 1])
            buckets.setdefault(key, []).append((ci, d))

        self.windows: List[List[str]] = []
        self.labels: List[int] = []
        self.tech_names: List[str] = []
        self.track_keys: List[str] = []
        for key in sorted(buckets):
            lst = [d for _, d in sorted(buckets[key])]
            # per-clip frame count from the first file
            try:
                t_clip = np.load(os.path.join(lst[0], "images.npy"), mmap_mode="r").shape[0]
            except Exception:
                continue
            # consecutive clips from the preprocess writer OVERLAP: clip
            # i+1 starts clip_step frames after clip i (CLIP_STEP=4 <
            # CLIP_LENGTH=8, mirroring preprocessing_parallel.py:97/:416),
            # so k stitched clips yield t_clip + (k-1)*step unique frames —
            # NOT k*t_clip. Stitching whole clips would duplicate frames
            # and jump time backward at every boundary.
            step = min(clip_step if clip_step is not None else CLIP_STEP, t_clip)
            if T <= t_clip:
                need = 1
            else:
                need = 1 + -(-(T - t_clip) // step)  # ceil
            # tracks shorter than one full window still train/score — the
            # pad-with-last-frame path (TEST2.py:358) completes the clip
            spans = ([lst] if len(lst) < need
                     else [lst[i : i + need] for i in range(len(lst) - need + 1)])
            for win in spans:
                self.windows.append(win)
                self.labels.append(label_from_dir(win[0]))
                self.tech_names.append(infer_tech_from_path(win[0]))
                self.track_keys.append(key)
        if not self.windows:
            raise RuntimeError("no image clips found")
        self.clip_step = clip_step if clip_step is not None else CLIP_STEP
        self.T = T
        self.is_train = is_train
        self.aug = dict(color_jitter=color_jitter, p_gauss_blur=p_gauss_blur,
                        p_gauss_noise=p_gauss_noise, p_jpeg=p_jpeg,
                        p_erase=p_erase, geo_jitter=geo_jitter)
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.windows)

    def _augment(self, clip: np.ndarray) -> np.ndarray:
        """Clip-consistent pixel + geometry augs (same params across frames,
        as the temporal model requires)."""
        rng = self.rng
        a = self.aug
        if a.get("geo_jitter", 0) > 0 and rng.rand() < 0.8:
            # small clip-consistent similarity jitter (rotation/scale/shift):
            # serving re-derives the alignment from ITS OWN detector+tracker
            # state, so the serve-time crop differs from the dataset crop by
            # exactly this kind of perturbation — without it, a model whose
            # in-domain margins are thin flips under serve-time geometry
            # noise (round-5 capstone: aligned-domain eval AUC 1.0 vs 0.82
            # through the engine)
            import cv2

            g = a["geo_jitter"]
            h, w = clip.shape[1:3]
            ang = rng.uniform(-6.0, 6.0) * g
            sc = 1.0 + rng.uniform(-0.08, 0.08) * g
            tx = rng.uniform(-0.04, 0.04) * g * w
            ty = rng.uniform(-0.04, 0.04) * g * h
            M = cv2.getRotationMatrix2D((w / 2, h / 2), ang, sc)
            M[:, 2] += (tx, ty)
            clip = np.stack([
                cv2.warpAffine(f, M, (w, h), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_REPLICATE)
                for f in clip])
        out = clip.astype(np.float32)
        if a["color_jitter"] > 0:
            b = 1.0 + rng.uniform(-a["color_jitter"], a["color_jitter"])
            c = 1.0 + rng.uniform(-a["color_jitter"], a["color_jitter"])
            mean = out.mean()
            out = np.clip((out - mean) * c + mean * b, 0, 255)
        if rng.rand() < a["p_gauss_noise"]:
            out = np.clip(out + rng.randn(*out.shape) * 5.0, 0, 255)
        out = out.astype(np.uint8)
        if rng.rand() < a["p_gauss_blur"]:
            import cv2

            k = rng.choice([3, 5])
            out = np.stack([cv2.GaussianBlur(f, (k, k), 0) for f in out])
        if rng.rand() < a["p_jpeg"]:
            from .degrade import jpeg_recompress

            q = rng.randint(60, 95)
            out = np.stack([jpeg_recompress(f, q) for f in out])
        if rng.rand() < a["p_erase"]:
            h, w = out.shape[1:3]
            eh, ew = rng.randint(h // 8, h // 3), rng.randint(w // 8, w // 3)
            y0, x0 = rng.randint(0, h - eh), rng.randint(0, w - ew)
            out[:, y0 : y0 + eh, x0 : x0 + ew] = 0
        return out

    def _stitch(self, dirs: List[str]) -> np.ndarray:
        """Unique, time-ordered frames from overlapping consecutive clips.

        Preferred path: exact dedupe by the writer's ``frame_ids.npy``
        (robust to gapped clips). Fallback for trees written before round 3:
        the writer convention — each subsequent clip contributes its last
        ``clip_step`` frames (the rest repeat the previous clip's tail)."""
        clips = [np.load(os.path.join(d, "images.npy")) for d in dirs]
        fid_paths = [os.path.join(d, "frame_ids.npy") for d in dirs]
        if all(os.path.isfile(p) for p in fid_paths):
            seen, keep = set(), []
            for c, f in zip(clips, (np.load(p) for p in fid_paths)):
                for frame, fid in zip(c, f):
                    if int(fid) not in seen:
                        seen.add(int(fid))
                        keep.append(frame)
            return np.stack(keep)
        step = min(self.clip_step, clips[0].shape[0])
        parts = [clips[0]] + [c[c.shape[0] - step:] for c in clips[1:]]
        return np.concatenate(parts)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        frames = self._stitch(self.windows[i])
        if frames.shape[0] >= self.T:
            if self.is_train:
                s = self.rng.randint(0, frames.shape[0] - self.T + 1)
                frames = frames[s : s + self.T]
            else:
                frames = frames[: self.T]
        else:  # pad with the last frame (TEST2.py:358)
            pad = np.repeat(frames[-1:], self.T - frames.shape[0], axis=0)
            frames = np.concatenate([frames, pad])
        if self.is_train:
            frames = self._augment(frames)
        return {"clip": frames, "y": float(self.labels[i])}

    def batches(self, batch_size: int, shuffle: Optional[bool] = None, seed: int = 0):
        order = np.arange(len(self))
        if shuffle if shuffle is not None else self.is_train:
            np.random.RandomState(seed).shuffle(order)
        if 0 < len(order) < batch_size:
            # smaller than one batch: emit it whole rather than silently
            # yielding nothing (tails of larger datasets still drop,
            # DistributedSampler-style); costs one extra XLA shape
            rows = [self[int(i)] for i in order]
            yield (np.stack([r["clip"] for r in rows]),
                   np.asarray([r["y"] for r in rows], np.float32))
            return
        for s in range(0, len(order) - batch_size + 1, batch_size):
            rows = [self[int(i)] for i in order[s : s + batch_size]]
            yield (np.stack([r["clip"] for r in rows]),
                   np.asarray([r["y"] for r in rows], np.float32))
