"""Realtime app layer tests: frame sources, interlocutor picking, overlay,
meeting verdict loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig, PipelineConfig
from stdd_tpu.ops.align import STD_POINTS_256
from stdd_tpu.runtime import sources
from stdd_tpu.runtime.app import RealtimeApp, in_exclude_rect, pick_interlocutor, run_loop
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.runtime.engine import StreamingEngine


def test_sources_synthetic_and_roi():
    frames = list(sources.iter_synthetic(5, hw=(120, 160), seed=0))
    assert len(frames) == 5 and frames[0].shape == (120, 160, 3)
    rois = list(sources.iter_roi(iter(frames), repick_every=2))
    assert len(rois) == 5
    assert all(r.size > 0 for r in rois)


def test_video_file_source(tmp_path):
    cv2 = pytest.importorskip("cv2")
    p = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for _ in range(7):
        vw.write(np.zeros((48, 64, 3), np.uint8))
    vw.release()
    assert len(list(sources.iter_video_file(p))) == 7
    assert len(list(sources.iter_video_file(p, max_frames=3))) == 3
    assert len(list(sources.iter_video_file(p, loop=True, max_frames=10))) == 10


def test_exclude_rect_and_interlocutor():
    H, W = 720, 1280
    rect = (0.70, 0.70, 1.00, 1.00)
    self_view = np.array([1000, 600, 1200, 700])  # bottom-right
    other = np.array([100, 100, 300, 350])
    assert in_exclude_rect(self_view, H, W, rect)
    assert not in_exclude_rect(other, H, W, rect)
    boxes = {1: self_view, 2: other}
    assert pick_interlocutor(boxes, H, W, rect) == 2
    # only self-view faces → fallback to largest
    assert pick_interlocutor({1: self_view}, H, W, rect) == 1
    assert pick_interlocutor({}, H, W, rect) is None


def _app(n_faces=1):
    pipe = PipelineConfig(clip_size=8, stride=4, detect_every=2, batch_clips=2,
                          min_face_side=5)
    scorer = ClipScorer.random_init(cfg=I3DConfig(num_frames=8, crop_size=64),
                                    dtype=jnp.float32)
    state = {"i": 0}

    def detect(frame):
        i = state["i"]
        state["i"] += 1
        rows = []
        for k in range(n_faces):
            x, y = 30 + 90 * k + i, 25
            lm = (STD_POINTS_256 * (50 / 256.0) + np.array([x, y])).reshape(-1)
            rows.append([x, y, 50.0, 55.0, *lm, 0.95])
        return np.asarray(rows, np.float32)

    engine = StreamingEngine(scorer, detect, cfg=pipe, crop_buffer=128,
                             q_weighting=False, q_lap_hard=0.0)
    return RealtimeApp(engine, threshold=0.0, decision_min_frames=10)


def test_run_loop_and_verdict(tmp_path):
    pytest.importorskip("cv2")
    app = _app()
    overlays = []
    ready, fake = run_loop(
        app, sources.iter_synthetic(30, hw=(240, 320), seed=0),
        on_frame=overlays.append,
        out_video=str(tmp_path / "overlay.mp4"),
    )
    assert ready  # ≥10 frames on the track
    assert fake   # threshold 0 ⇒ any positive score flags
    assert len(overlays) == 30
    assert overlays[0].shape == (240, 320, 3)
    assert (tmp_path / "overlay.mp4").exists()
    # overlay actually drew something (box + text differ from input)
    raw = list(sources.iter_synthetic(1, hw=(240, 320), seed=0))[0]
    assert np.abs(overlays[-1].astype(int) - raw.astype(int)).max() > 0
