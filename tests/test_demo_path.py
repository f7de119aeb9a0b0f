"""Demo-pipeline tests: greedy tracking parity vs the reference, clip
assembly on the repo's REAL cached-detection fixture, end-to-end eval."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.eval.demo import build_clips, eval_video, load_reference_cache
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.track.greedy import find_longest, multiple_tracking, simple_tracking

REF = "/root/reference/altfreezing"
FIXTURE = REF + "/examples/shining.mp4_32_retina_320.pth"      # greedy-trackable
FIXTURE_YUNET = REF + "/examples/shining.mp4_32_yunet_320.pth"  # has stored track


def _ref_ops():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "filterpy" not in sys.modules:
        # ct.tracking.sort imports filterpy (unused by the iou helper)
        import types

        fp = types.ModuleType("filterpy")
        fp.kalman = types.SimpleNamespace(KalmanFilter=object)
        sys.modules["filterpy"] = fp
        sys.modules["filterpy.kalman"] = fp.kalman  # type: ignore[assignment]
    from test_tools.ct import operations

    return operations


def _synth_detections(rng, n_frames=20, n_faces=2, dropout_at=None):
    dets = []
    for f in range(n_frames):
        faces = []
        for k in range(n_faces):
            if dropout_at and (f, k) in dropout_at:
                continue
            x = 30 + 120 * k + 1.5 * f + rng.randn() * 0.5
            y = 40 + 0.5 * f
            box = np.array([x, y, x + 70, y + 80], float)
            lm5 = np.tile(box[:2], (5, 1)) + 10
            faces.append((box, lm5, 0.95))
        dets.append(faces)
    return dets


def test_greedy_tracking_matches_reference():
    ops = _ref_ops()
    rng = np.random.RandomState(0)
    dets = _synth_detections(rng, n_frames=20, n_faces=3)
    for idx in range(3):
        ref = ops.simple_tracking(dets, index=idx)
        got = simple_tracking(dets, index=idx)
        assert (ref is None) == (got is None)
        if ref is not None:
            for rf, gf in zip(ref, got):
                np.testing.assert_array_equal(rf[0], gf[0])
    # with a mid-track dropout the chain must break identically
    dets2 = _synth_detections(rng, dropout_at={(10, 0), (10, 1)})
    assert ops.simple_tracking(dets2) is None and simple_tracking(dets2) is None

    t_ref = ops.multiple_tracking(dets)
    t_got = multiple_tracking(dets)
    assert len(t_ref) == len(t_got) == 3

    tu_ref, tr_ref = ops.find_longest(dets2)
    tu_got, tr_got = find_longest(dets2)
    assert tu_ref == tu_got
    assert len(tr_ref) == len(tr_got)


def test_tracking_on_real_fixture():
    """Real detections from the repo's example video: the retina cache is
    greedy-trackable (one 32-frame track); the yunet cache additionally
    stores the track another pipeline computed (1 track over (0, 32))."""
    torch = pytest.importorskip("torch")
    detect_res, lm68s = load_reference_cache(FIXTURE)
    merged = [
        [(np.asarray(b), np.asarray(l), np.asarray(l68), float(s))
         for (b, l, s), l68 in zip(faces, lms)]
        for faces, lms in zip(detect_res, lm68s)
    ]
    tracks = multiple_tracking(merged)
    assert len(tracks) == 1 and len(tracks[0]) == 32

    obj = torch.load(FIXTURE_YUNET, map_location="cpu", weights_only=False)
    assert len(obj[2]) == 1 and list(obj[3]) == [(0, 32)]


def test_demo_eval_on_real_fixture_geometry():
    """End-to-end demo eval: real detections/landmarks from the fixture,
    synthetic frame pixels, tiny scorer."""
    torch = pytest.importorskip("torch")
    detect_res, lm68s = load_reference_cache(FIXTURE)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (480, 854, 3), np.uint8) for _ in range(len(detect_res))]

    scorer = ClipScorer.random_init(cfg=I3DConfig(num_frames=8, crop_size=64),
                                    dtype=jnp.float32)
    res = eval_video(
        scorer, frames, detect_res=detect_res, lm68s=lm68s,
        clip_size=8, crop_buffer=192, batch=4,
    )
    assert res["clips"] >= 20  # 32-frame track, clip 8, stride 1 → 25 windows
    assert 0.0 < res["video_score"] < 1.0
    assert res["frames"] == 32


def test_reflect_padding_short_track():
    """Tracks shorter than clip_size get reflect-padded (demo.py:288-302)."""
    rng = np.random.RandomState(1)
    dets = _synth_detections(rng, n_frames=5, n_faces=1)
    lm68s = [[np.tile(f[0][:2], (68, 1)) + 12 for f in faces] for faces in dets]
    frames = [rng.randint(0, 255, (240, 320, 3), np.uint8) for _ in range(5)]
    clips = build_clips(dets, lm68s, frames, clip_size=8)
    assert len(clips) == 1
    assert len(clips[0]) == 8
    idxs = [e["frame_idx"] for e in clips[0]]
    assert sorted(set(idxs)) == [0, 1, 2, 3, 4]  # all real frames present


def test_dense_track_scoring_matches_packed():
    """score_dense (device-resident track buffer, on-device window slices)
    matches the packed per-window path on the reference fixture."""
    import jax

    from stdd_tpu.config import I3DConfig
    from stdd_tpu.eval.demo import eval_video, load_reference_cache
    from stdd_tpu.runtime.classifier import ClipScorer

    det, lm68 = load_reference_cache(FIXTURE)
    n = 40
    det, lm68 = det[:n], lm68[:n]
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (360, 640, 3), np.uint8) for _ in range(n)]
    scorer = ClipScorer.random_init(
        cfg=I3DConfig(num_frames=32, crop_size=224), dtype=jnp.float32
    )
    r_packed = eval_video(scorer, frames, detect_res=det, lm68s=lm68,
                          clip_size=32, batch=4, crop_buffer=256)
    r_dense = eval_video(scorer, frames, detect_res=det, lm68s=lm68,
                         clip_size=32, batch=4, crop_buffer=256, dense=True)
    assert r_dense["clips"] == r_packed["clips"]
    np.testing.assert_allclose(
        sorted(r_dense["preds"]), sorted(r_packed["preds"]), atol=2e-3
    )


def test_dense_respects_clip_size():
    """Dense path slices clip_size-frame windows (not scorer num_frames) —
    non-default --clip_size matches the packed path (review regression)."""
    import jax

    from stdd_tpu.config import I3DConfig
    from stdd_tpu.eval.demo import eval_video
    from stdd_tpu.ops.align import STD_POINTS_256
    from stdd_tpu.runtime.classifier import ClipScorer

    rng = np.random.RandomState(0)
    n = 20
    det = [[(np.array([10.0, 10.0, 80.0, 80.0]),
             np.asarray(STD_POINTS_256) * 0.25 + 20, 0.9)] for _ in range(n)]
    lm68 = [[np.tile(np.array([40.0, 40.0]), (68, 1))] for _ in range(n)]
    frames = [rng.randint(0, 255, (120, 160, 3), np.uint8) for _ in range(n)]
    scorer = ClipScorer.random_init(
        cfg=I3DConfig(num_frames=8, crop_size=64), dtype=jnp.float32
    )
    for clip_size in (8, 12):   # == and != scorer num_frames
        r_p = eval_video(scorer, frames, detect_res=det, lm68s=lm68,
                         clip_size=clip_size, batch=2, crop_buffer=96)
        r_d = eval_video(scorer, frames, detect_res=det, lm68s=lm68,
                         clip_size=clip_size, batch=2, crop_buffer=96, dense=True)
        assert r_d["clips"] == r_p["clips"] == n - clip_size + 1
        np.testing.assert_allclose(r_d["preds"], r_p["preds"], atol=2e-3)
