"""Serving this framework's OWN trained checkpoints.

``ClipScorer.from_jax_checkpoint`` closes the loop between the trainer
(``train.run_i3d`` → ``utils.checkpoint.save_checkpoint`` msgpack pytrees)
and every serving surface (harness/app/demo CLIs via ``--jax_ckpt``) —
the reference's equivalent is serving a ModelBase epoch checkpoint
(model/_base.py:39). The synth end-to-end capstone
(scripts/run_synth_e2e.py) exercises the full path; these tests pin the
load semantics."""

import numpy as np
import pytest

from stdd_tpu.config import I3DConfig


CFG = I3DConfig(num_frames=8, crop_size=64)


def _tiny_scorer():
    import jax.numpy as jnp

    from stdd_tpu.runtime.classifier import ClipScorer

    return ClipScorer.random_init(cfg=CFG, seed=3, dtype=jnp.float32)


def _sample_batch(rng):
    T = CFG.num_frames
    crops = rng.randint(0, 255, (1, T, 96, 96, 3), np.uint8)
    boxes = np.tile(np.array([10.0, 8.0, 90.0, 92.0], np.float32), (1, T, 1))
    from stdd_tpu.ops.align import STD_POINTS_256

    lm5 = np.tile(STD_POINTS_256 * (70.0 / 256.0) + 8.0, (1, T, 1, 1)).astype(
        np.float32)
    return crops, boxes, lm5, np.array([True])


def test_from_jax_checkpoint_roundtrip(tmp_path):
    """save_checkpoint (with opt_state, as run_i3d writes) → from_jax_checkpoint
    serves bit-identical scores; the opt_state leaves are ignored."""
    import jax.numpy as jnp

    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.utils.checkpoint import save_checkpoint

    src = _tiny_scorer()
    tree = {"params": src.variables["params"],
            "batch_stats": src.variables["batch_stats"],
            "opt_state": {"momentum": np.zeros(3, np.float32)}}
    path = save_checkpoint(str(tmp_path), "i3d", 7, tree)

    dst = ClipScorer.from_jax_checkpoint(path, cfg=CFG, dtype=jnp.float32)
    crops, boxes, lm5, valid = _sample_batch(np.random.RandomState(0))
    p_src = np.asarray(src.score(crops, boxes, lm5, valid))
    p_dst = np.asarray(dst.score(crops, boxes, lm5, valid))
    np.testing.assert_array_equal(p_src, p_dst)


def test_from_jax_checkpoint_reads_sidecar_geometry(tmp_path):
    """run_i3d writes a sidecar metadata JSON (crop_size/clip_size) next to
    each checkpoint; ``from_jax_checkpoint(cfg=None)`` reconstructs the
    training geometry from it, so a non-224 crop checkpoint is never
    silently served at 224 (ADVICE r4 #2 — I3D params are crop-independent,
    so the wrong crop LOADS cleanly and only degrades scores)."""
    import jax.numpy as jnp

    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.utils.checkpoint import save_checkpoint

    src = _tiny_scorer()
    tree = {"params": src.variables["params"],
            "batch_stats": src.variables["batch_stats"]}
    path = save_checkpoint(str(tmp_path), "i3d", 3, tree,
                           metadata={"crop_size": CFG.crop_size,
                                     "clip_size": CFG.num_frames,
                                     "temporal_only": False, "epoch": 3})

    dst = ClipScorer.from_jax_checkpoint(path, cfg=None, dtype=jnp.float32)
    assert dst.cfg.crop_size == CFG.crop_size
    assert dst.cfg.num_frames == CFG.num_frames
    crops, boxes, lm5, valid = _sample_batch(np.random.RandomState(0))
    np.testing.assert_array_equal(
        np.asarray(src.score(crops, boxes, lm5, valid)),
        np.asarray(dst.score(crops, boxes, lm5, valid)))


def test_harness_cli_serves_jax_ckpt_parity(tmp_path):
    """The harness CLI path end to end (VERDICT r4 #7): one rendered video
    scored through ``harness.main --jax_ckpt`` (real YuNet detections,
    engine built by the CLI) must produce the same video score as an
    engine built directly around ``ClipScorer.from_jax_checkpoint`` with
    the identical pipeline config — the CLI adds flag plumbing, not math.
    (Ref: the ModelBase.load serving path, model/_base.py:39.)"""
    import csv
    import os

    from stdd_tpu.config import PipelineConfig
    from stdd_tpu.eval.bench_scene import BenchScene
    from stdd_tpu.eval.harness import main as harness_main
    from stdd_tpu.eval.harness import run_video
    from stdd_tpu.models.yunet import YuNetTPU, detect_scaled
    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.runtime.engine import StreamingEngine
    from stdd_tpu.utils.checkpoint import save_checkpoint

    cv2 = pytest.importorskip("cv2")

    # one rendered talking head the real YuNet weights can detect
    vid = str(tmp_path / "vids" / "real" / "v.avi")
    os.makedirs(os.path.dirname(vid), exist_ok=True)
    scene = BenchScene((360, 640), n_faces=1, seed=5, face_px=288)
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 30, (640, 360))
    assert wr.isOpened()
    for i in range(24):
        wr.write(scene.frame(i))
    wr.release()

    src = _tiny_scorer()
    ckpt = save_checkpoint(
        str(tmp_path), "i3d", 1,
        {"params": src.variables["params"],
         "batch_stats": src.variables["batch_stats"]},
        metadata={"crop_size": CFG.crop_size, "clip_size": CFG.num_frames,
                  "temporal_only": False, "epoch": 1})

    out_dir = str(tmp_path / "results")
    harness_main(["--video_root", str(tmp_path / "vids"),
                  "--out_dir", out_dir, "--jax_ckpt", ckpt,
                  "--clip_size", str(CFG.num_frames), "--stride", "4",
                  "--batch_clips", "2", "--crop_buffer", "128",
                  "--det_conf", "0.25", "--track_thresh", "0.35",
                  "--min_det_side", "10", "--threshold", "0.5",
                  "--no_quality"])
    with open(os.path.join(out_dir, "per_video.csv")) as f:
        (row,) = list(csv.DictReader(f))
    cli_score = float(row["video_score"])

    # direct path: same weights via from_jax_checkpoint, same pipeline knobs
    pipe = PipelineConfig(clip_size=CFG.num_frames, stride=4, detect_every=4,
                          batch_clips=2, threshold=0.5, min_face_side=10)
    det = YuNetTPU(conf_threshold=0.25)
    # NOTE: default dtype on both paths — parity must compare like for like
    scorer = ClipScorer.from_jax_checkpoint(ckpt, cfg=None)
    eng = StreamingEngine(
        scorer, lambda f: detect_scaled(det, f, 320), cfg=pipe,
        crop_buffer=128, start_conf=0.25, q_weighting=False, q_lap_hard=0.0,
        track_kwargs=dict(track_thresh=0.35, match_thresh=0.8,
                          track_buffer=30, split_low_scores=False))
    direct = run_video(eng, vid, threshold=0.5)
    assert direct["num_tracks"] > 0
    assert abs(direct["video_score"] - cli_score) < 1e-6


def test_from_jax_checkpoint_rejects_geometry_mismatch(tmp_path):
    """A checkpoint trained at another width must refuse to serve (the
    tolerant merger reports shape mismatches; serving silently-random
    weights would be a correctness trap)."""
    import jax.numpy as jnp

    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.utils.checkpoint import save_checkpoint

    src = _tiny_scorer()
    tree = {"params": src.variables["params"],
            "batch_stats": src.variables["batch_stats"]}
    path = save_checkpoint(str(tmp_path), "i3d", 1, tree)

    # a genuinely different parameter tree must raise: halving
    # width_per_group changes every channel width -> shape mismatches
    with pytest.raises(ValueError, match="does not cover"):
        ClipScorer.from_jax_checkpoint(
            path, cfg=I3DConfig(num_frames=8, crop_size=64,
                                width_per_group=32),
            dtype=jnp.float32)


def test_checkpoint_gc_protects_best(tmp_path):
    """The rolling max_to_keep GC must never delete the checkpoint the
    best.json pointer names (bit a real 10-epoch run: best at epoch 1,
    max_to_keep 5 kept only epochs 6-10 and serving had nothing to load)."""
    import os

    from stdd_tpu.utils.checkpoint import save_checkpoint

    tree = {"w": np.zeros(3, np.float32)}
    for ep in range(1, 8):
        save_checkpoint(str(tmp_path), "i3d", ep, tree, max_to_keep=3,
                        protect="i3d_1.msgpack")
    kept = sorted(f for f in os.listdir(tmp_path) if f.endswith(".msgpack"))
    assert "i3d_1.msgpack" in kept          # the protected best survives
    assert "i3d_7.msgpack" in kept          # newest always kept
    assert len(kept) == 4                   # 3 rolling + 1 protected
