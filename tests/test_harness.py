"""Offline eval harness tests: video collection/labeling, CSV schemas, and an
end-to-end run over synthetic videos."""

import csv
import os

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig, PipelineConfig
from stdd_tpu.eval.harness import (
    PER_VIDEO_HEADER,
    SUMMARY_HEADER,
    classify_path,
    collect_from_list,
    collect_videos,
    run_video,
    summarize,
    write_csvs,
)
from stdd_tpu.ops.align import STD_POINTS_256
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.runtime.engine import StreamingEngine


def test_classify_path_tokens():
    assert classify_path("/data/celebdf_v2/celeb-real/a.mp4") == 0
    assert classify_path("/data/ffpp/manipulated_sequences/deepfakes/c23/x.mp4") == 1
    assert classify_path("/data/original_sequences/youtube/c23/y.mp4") == 0
    assert classify_path("/data/unknown/thing.mp4") is None


def _write_video(path, n_frames=24, size=(160, 120), seed=0):
    cv2 = pytest.importorskip("cv2")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, size)
    base = rng.randint(0, 255, (size[1], size[0], 3), np.uint8)
    for _ in range(n_frames):
        vw.write(base)
    vw.release()


def test_collect_videos(tmp_path):
    _write_video(str(tmp_path / "real" / "a.mp4"))
    _write_video(str(tmp_path / "fake" / "b.mp4"))
    _write_video(str(tmp_path / "fake" / "c.mp4"))
    vids = collect_videos(str(tmp_path), per_class=10)
    labels = sorted(l for _, l, _, _ in vids)
    assert labels == [0, 1, 1]


def test_collect_from_list(tmp_path):
    lp = tmp_path / "list.txt"
    lp.write_text("/x/real/a.mp4\n/y/fake/b.mp4,1\n# comment\n/z/unknown.mp4\n")
    vids = collect_from_list(str(lp))
    assert [(v[0], v[1]) for v in vids] == [("/x/real/a.mp4", 0), ("/y/fake/b.mp4", 1)]


def test_harness_end_to_end(tmp_path):
    """Synthetic 2-video eval with a fake detector and tiny model → CSVs."""
    pytest.importorskip("cv2")
    _write_video(str(tmp_path / "vids" / "real" / "a.mp4"), seed=1)
    _write_video(str(tmp_path / "vids" / "fake" / "b.mp4"), seed=2)

    cfg = PipelineConfig(
        clip_size=8, stride=4, detect_every=2, batch_clips=2, min_face_side=5,
        pool_method="mean",
    )
    scorer = ClipScorer.random_init(cfg=I3DConfig(num_frames=8, crop_size=64),
                                    dtype=jnp.float32)

    def detect(frame_bgr):
        lm = (STD_POINTS_256 * (50 / 256.0) + np.array([30, 25])).reshape(-1)
        return np.asarray([[30, 25, 50.0, 55.0, *lm, 0.95]], np.float32)

    engine = StreamingEngine(
        scorer, detect, cfg=cfg, crop_buffer=128,
        q_lap_hard=0.0, q_weighting=False,
    )

    rows = []
    for vp, gt in [(str(tmp_path / "vids" / "real" / "a.mp4"), 0),
                   (str(tmp_path / "vids" / "fake" / "b.mp4"), 1)]:
        r = run_video(engine, vp, threshold=0.5)
        r.update(gt_label=gt, dataset="test", subset="test",
                 device_mem_peak_mb=0.0, model_size=123)
        assert r["frames_processed"] == 24
        assert r["num_tracks"] == 1
        rows.append(r)

    summary = summarize(rows, model_size=123)
    assert summary["videos"] == 2
    write_csvs(rows, summary, str(tmp_path / "out"), threshold=0.5)

    with open(tmp_path / "out" / "per_video.csv") as f:
        got = list(csv.reader(f))
    assert got[0] == PER_VIDEO_HEADER and len(got) == 3
    with open(tmp_path / "out" / "summary.csv") as f:
        got = list(csv.reader(f))
    assert got[0] == SUMMARY_HEADER and len(got) == 2
