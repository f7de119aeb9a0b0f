"""Preprocessing-pipeline tests: video tree → clip tree → features → dataset
(the full dataset-production chain on synthetic videos)."""

import os

import numpy as np
import pytest

from stdd_tpu.data.features import AU_ORDER, process_clip_tree
from stdd_tpu.data.preprocess import (
    ClipWriter,
    PreprocessPipeline,
    already_processed,
    process_tree,
)
from stdd_tpu.ops.align import STD_POINTS_256

cv2 = pytest.importorskip("cv2")


def _write_video(path, n_frames=24, size=(320, 240), seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, size)
    base = rng.randint(0, 255, (size[1], size[0], 3), np.uint8)
    for _ in range(n_frames):
        vw.write(base)
    vw.release()


def _fake_detect(frame_bgr):
    lm = (STD_POINTS_256 * (60 / 256.0) + np.array([40, 30])).reshape(-1)
    return np.asarray([[40, 30, 60.0, 70.0, *lm, 0.9]], np.float32)


class _FakeAU:
    def __call__(self, faces):
        return [dict(zip([f"AU{i:02d}" for i in (1, 2, 4, 6, 7, 10, 12, 14, 15, 17, 23, 24)],
                         [float(i % 2) for i in range(12)])) for _ in range(len(faces))]


def _fake_landmarker(frame_rgb, tlbr):
    rng = np.random.RandomState(int(tlbr[0]) % 100)
    pts = rng.uniform(0.2, 0.8, (478, 2)).astype(np.float32) * 100
    # keep the sentinel's five referee points (iris/nose/mouth) consistent
    # with _fake_detect's lm5 so the landmark-quality sentinel stays green
    from stdd_tpu.models.facemesh import LM5_DENSE_IDX

    lm5 = (STD_POINTS_256 * (60 / 256.0) + np.array([40, 30])).astype(np.float32)
    pts[list(LM5_DENSE_IDX)] = lm5
    return pts


def test_pipeline_writes_clips(tmp_path):
    _write_video(str(tmp_path / "vids" / "real" / "a.mp4"))
    pipe = PreprocessPipeline(
        _fake_detect, au_extractor=_FakeAU(), landmarker=_fake_landmarker,
        clip_length=8, clip_step=4,
    )
    logs = process_tree(pipe, str(tmp_path / "vids"), str(tmp_path / "out"))
    assert len(logs) == 1
    # 24 frames, clip 8 step 4 → clips at frames 8,12,16,20,24 → 5 clips
    assert logs[0]["clips"] == 5
    clip0 = tmp_path / "out" / "real" / "a" / "track_1" / "clip_00000"
    imgs = np.load(clip0 / "images.npy")
    assert imgs.shape == (8, 224, 224, 3) and imgs.dtype == np.uint8
    lms = np.load(clip0 / "landmarks.npy", allow_pickle=True)
    assert len(lms) == 8 and lms[0].shape == (478, 2)
    aus = np.load(clip0 / "aus.npy", allow_pickle=True)
    assert len(aus) == 8 and isinstance(aus[0], dict)
    assert (tmp_path / "out" / "master_clip_log.csv").exists()
    assert (tmp_path / "out" / "pipeline_performance_log.csv").exists()


def test_resume_skip(tmp_path):
    _write_video(str(tmp_path / "vids" / "real" / "a.mp4"))
    pipe = PreprocessPipeline(_fake_detect, au_extractor=_FakeAU())
    process_tree(pipe, str(tmp_path / "vids"), str(tmp_path / "out"))
    assert already_processed(str(tmp_path / "out"), "real/a")
    logs2 = process_tree(pipe, str(tmp_path / "vids"), str(tmp_path / "out"))
    assert logs2 == []  # everything skipped


def test_full_chain_to_dataset(tmp_path):
    """videos → clips → features → DualFeaturesClipDataset."""
    _write_video(str(tmp_path / "vids" / "original" / "v0.mp4"), seed=1)
    _write_video(str(tmp_path / "vids" / "deepfakes" / "v1.mp4"), seed=2)
    pipe = PreprocessPipeline(
        _fake_detect, au_extractor=_FakeAU(), landmarker=_fake_landmarker,
    )
    process_tree(pipe, str(tmp_path / "vids"), str(tmp_path / "out"))
    stats = process_clip_tree(str(tmp_path / "out"))
    assert stats["lmk_ok"] > 0 and stats["au_ok"] > 0

    from stdd_tpu.data.dataset import DualFeaturesClipDataset

    ds = DualFeaturesClipDataset(root_dir=str(tmp_path / "out"), T=8)
    assert len(ds) == 10
    assert set(ds.labels) == {0, 1}
    item = ds[0]
    assert item["A"].shape == (8, 36) and item["L"].shape == (8, 132)


def test_au_last_known_fill(tmp_path):
    """AU cadence 2 with last-known fill → every clip frame has AU data."""
    _write_video(str(tmp_path / "vids" / "real" / "a.mp4"), n_frames=10)
    calls = {"n": 0}

    class CountingAU(_FakeAU):
        def __call__(self, faces):
            calls["n"] += 1
            return super().__call__(faces)

    pipe = PreprocessPipeline(_fake_detect, au_extractor=CountingAU(), au_every=2)
    process_tree(pipe, str(tmp_path / "vids"), str(tmp_path / "out"))
    assert calls["n"] == 5  # every other of 10 frames
    aus = np.load(
        tmp_path / "out" / "real" / "a" / "track_1" / "clip_00000" / "aus.npy",
        allow_pickle=True,
    )
    assert all(a is not None for a in aus)


def test_clip_frame_span_respects_detection_gaps(tmp_path):
    """ClipTask.frame_start/frame_end reflect the true (gapped) frame ids,
    not an assumed-contiguous window."""
    import numpy as np
    from stdd_tpu.data.preprocess import ClipWriter, PreprocessPipeline

    gap_frames = {3, 4}  # detector returns nothing on these frames

    class FakeCap:
        def __init__(self, *_a):
            self.i = 0

        def read(self):
            if self.i >= 12:
                return False, None
            self.i += 1
            return True, np.full((64, 64, 3), self.i, np.uint8)

        def release(self):
            pass

    def detect(frame_bgr):
        fid = int(frame_bgr[0, 0, 0]) - 1
        if fid in gap_frames:
            return np.empty((0, 15))
        return np.array([[8.0, 8.0, 40.0, 40.0] + [20.0] * 10 + [0.9]])

    import cv2

    orig = cv2.VideoCapture
    cv2.VideoCapture = FakeCap
    try:
        pipe = PreprocessPipeline(detect, clip_length=8, clip_step=4)
        w = ClipWriter(str(tmp_path))
        spans = []
        orig_submit = w.submit
        w.submit = lambda t: (spans.append((t.frame_start, t.frame_end)), orig_submit(t))[1]
        pipe.process_video("fake.mp4", w, "v")
        w.close()
    finally:
        cv2.VideoCapture = orig
    # frames with detections: 0,1,2,5,6,7,8,9,10,11 → first clip of 8 spans 0..9
    assert spans and spans[0] == (0, 9)


def test_lm_sentinel_logs_agreement_and_passes_good_landmarker(tmp_path):
    """Landmark-quality sentinel (VERDICT r3 #4): with a landmarker whose
    iris/mouth/nose agree with the detector's lm5, clips are written and
    master_clip_log.csv carries a near-zero lm5_agreement column with
    lm_flagged False."""
    import csv

    _write_video(str(tmp_path / "vids" / "a.mp4"))
    pipe = PreprocessPipeline(_fake_detect, landmarker=_fake_landmarker,
                              clip_length=8, clip_step=4)
    logs = process_tree(pipe, str(tmp_path / "vids"), str(tmp_path / "out"))
    assert logs[0]["clips"] == 5
    with open(tmp_path / "out" / "master_clip_log.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5
    for r in rows:
        assert float(r["lm5_agreement"]) < 0.02, r
        assert r["lm_flagged"] == "False"
    assert not pipe._lm_flagged


def test_lm_sentinel_flags_disagreeing_landmarker(tmp_path):
    """A landmarker whose points drift far from the detector's lm5 referee
    is flagged after the rolling window fills; its dense landmarks stop
    being trusted. The track's PIXEL clips keep being written (the detector
    referee proved the face is fine) with all landmarks nulled, so the
    feature converter gates the track out of the landmark path only —
    flagged tracks degrade, they don't vanish (VERDICT r4 #6; reference
    MediaPipe-failure handling, preprocessing_parallel.py:321)."""
    import csv

    import numpy as np

    from stdd_tpu.data.features import process_clip_tree

    def bad_landmarker(frame_rgb, tlbr):
        pts = _fake_landmarker(frame_rgb, tlbr)
        return pts + 0.5 * 60.0   # ~0.5 box-widths off: far past the bound

    _write_video(str(tmp_path / "vids" / "a.mp4"))
    pipe = PreprocessPipeline(_fake_detect, landmarker=bad_landmarker,
                              clip_length=8, clip_step=4)
    logs = process_tree(pipe, str(tmp_path / "vids"), str(tmp_path / "out"))
    assert pipe._lm_flagged == {1}
    # flagged at frame 3 (rolling min count) → dense landmarks nulled, but
    # the image clips still flow to the pixel-path consumers
    assert logs[0]["clips"] == 5
    with open(tmp_path / "out" / "master_clip_log.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5 and all(r["lm_flagged"] == "True" for r in rows)
    clip0 = tmp_path / "out" / "a" / "track_1" / "clip_00000"
    lms = np.load(clip0 / "landmarks.npy", allow_pickle=True)
    assert all(l is None for l in lms)
    # the feature converter writes NO lmk features for the nulled clips —
    # the flagged track is gated out of the landmark path
    stats = process_clip_tree(str(tmp_path / "out"))
    assert stats["lmk_ok"] == 0
    assert not (clip0 / "lmk_features.npy").exists()

    # sentinel off: the same landmarker sails through (legacy behavior)
    pipe2 = PreprocessPipeline(_fake_detect, landmarker=bad_landmarker,
                               clip_length=8, clip_step=4, lm_sentinel=False)
    logs2 = process_tree(pipe2, str(tmp_path / "vids"), str(tmp_path / "out2"))
    assert logs2[0]["clips"] == 5
    assert not pipe2._lm_flagged


def test_lm5_agreement_order_free_and_scaled():
    """lm5_agreement: zero on exact placement regardless of the detector's
    eye/mouth left-right order, scales inversely with box width."""
    from stdd_tpu.models.facemesh import LM5_DENSE_IDX, lm5_agreement

    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 100, (478, 2)).astype(np.float32)
    lm5 = pts[list(LM5_DENSE_IDX)].copy()
    assert lm5_agreement(pts, lm5, 60.0) == 0.0
    swapped = lm5[[1, 0, 2, 4, 3]]       # flip both pairs
    assert lm5_agreement(pts, swapped, 60.0) == 0.0
    off = lm5 + np.array([6.0, 0.0], np.float32)   # uniform 6px shift
    a60 = lm5_agreement(pts, off, 60.0)
    a120 = lm5_agreement(pts, off, 120.0)
    assert abs(a60 - 0.1) < 1e-6 and abs(a120 - 0.05) < 1e-6


def test_aligned_mode_writes_serving_geometry_clips(tmp_path):
    """--aligned: images.npy holds clip-stable warp-aligned crops whose
    geometry matches the serving scorer's (one similarity per clip against
    the canonical template), closing the train/serve domain gap the plain
    writer has (round-5 capstone: plain-crop training cost video AUC
    1.0 -> 0.847 when served aligned)."""
    import numpy as np

    from stdd_tpu.ops.align import STD_POINTS_256, find_similarity_np

    def detect(frame_bgr):
        # one face with a realistic lm5 layout (template scaled into the box)
        lm = (STD_POINTS_256 * (44.0 / 256.0) + np.array([10.0, 9.0])).reshape(-1)
        return np.asarray([[8.0, 8.0, 48.0, 48.0, *lm, 0.9]], np.float32)

    _write_video(str(tmp_path / "vids" / "a.mp4"))
    pipe = PreprocessPipeline(detect, clip_length=8, clip_step=4,
                              crop_size=(64, 64), aligned=True)
    logs = process_tree(pipe, str(tmp_path / "vids"), str(tmp_path / "out"))
    assert logs[0]["clips"] == 5
    imgs = np.load(tmp_path / "out" / "a" / "track_1" / "clip_00000" /
                   "images.npy")
    assert imgs.shape == (8, 64, 64, 3) and imgs.dtype == np.uint8
    # the written clip is in template coordinates: warping the detector's
    # lm5 with the clip's OWN fitted similarity must land on the template
    lm5 = STD_POINTS_256 * (44.0 / 256.0) + np.array([10.0, 9.0])
    # stationary face => per-frame lm5 identical; fit exactly as the writer
    from stdd_tpu.runtime.engine import get_crop_box

    big = get_crop_box((240, 320), np.array([8.0, 8.0, 48.0, 48.0]), 0.5)
    local = lm5 - big[:2]
    pts = np.tile(local, (8, 1)).astype(np.float32)
    tpl = np.tile(STD_POINTS_256 * (64 / 256.0), (8, 1)).astype(np.float32)
    T = find_similarity_np(pts, tpl)
    p = np.concatenate([pts, np.ones((40, 1), np.float32)], axis=1) @ T
    np.testing.assert_allclose(p[:, :2], tpl, atol=0.5)
