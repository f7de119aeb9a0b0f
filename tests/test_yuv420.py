"""YUV420 (I420) upload path: half the host→device bytes for the streaming
engine. Video-call frames arrive 4:2:0-subsampled from the codec, so packing
crops as I420 loses nothing the transport hadn't already dropped; the scorer
reconstructs RGB on device (classifier.yuv420_to_rgb)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig, PipelineConfig
from stdd_tpu.runtime.classifier import ClipScorer, yuv420_to_rgb
from stdd_tpu.runtime.packing import pack_clip_batch

cv2 = pytest.importorskip("cv2")


def _smooth_rgb(h, w, seed=0):
    """Low-frequency image — chroma-subsample-friendly, like real faces."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 120 + 80 * np.sin(xx / 37.0 + seed) * np.cos(yy / 29.0)
    g = 110 + 70 * np.cos(xx / 23.0 - seed)
    b = 100 + 60 * np.sin(yy / 31.0 + 2 * seed)
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def test_yuv420_to_rgb_matches_cv2_decode():
    """Device decode == cv2.COLOR_YUV2RGB_I420 up to its uint8 rounding."""
    rgb = np.random.RandomState(0).randint(0, 256, (32, 32, 3), np.uint8)
    planar = cv2.cvtColor(rgb, cv2.COLOR_RGB2YUV_I420)         # [48, 32]
    back_cv = cv2.cvtColor(planar, cv2.COLOR_YUV2RGB_I420).astype(np.float32)
    back_dev = np.asarray(yuv420_to_rgb(jnp.asarray(planar)))
    assert np.abs(back_dev - back_cv).max() <= 0.51


def test_yuv420_roundtrip_small_on_smooth_content():
    rgb = _smooth_rgb(64, 64)
    planar = cv2.cvtColor(rgb, cv2.COLOR_RGB2YUV_I420)
    back = np.asarray(yuv420_to_rgb(jnp.asarray(planar)))
    # video-range quantization + 2x2 chroma subsample on smooth content
    assert np.abs(back - rgb.astype(np.float32)).mean() < 1.5
    assert np.abs(back - rgb.astype(np.float32)).max() < 12


def _fake_clip_entries(T, size=90, seed=0):
    from stdd_tpu.ops.align import STD_POINTS_256

    entries = []
    for t in range(T):
        crop = _smooth_rgb(size, size, seed=seed + 0.1 * t)
        lm5 = STD_POINTS_256 * (size / 256.0)
        box = np.array([10 + t, 12 + t, 10 + t + size, 12 + t + size], np.float32)
        entries.append(dict(crop=crop, big_box=box, lm5=lm5.astype(np.float32)))
    return entries


def test_pack_yuv420_shapes_and_content():
    T, S = 4, 64
    clips = [_fake_clip_entries(T)]
    crops_rgb, boxes_r, lm5_r, valid_r = pack_clip_batch(clips, 2, T, S)
    crops_yuv, boxes_y, lm5_y, valid_y = pack_clip_batch(clips, 2, T, S, yuv420=True)
    assert crops_yuv.shape == (2, T, S * 3 // 2, S)
    np.testing.assert_array_equal(boxes_r, boxes_y)
    np.testing.assert_array_equal(lm5_r, lm5_y)
    np.testing.assert_array_equal(valid_r, valid_y)
    # decoded planar ≈ the rgb packing of the same entries
    dec = np.asarray(yuv420_to_rgb(jnp.asarray(crops_yuv[0])))
    err = np.abs(dec - crops_rgb[0].astype(np.float32))
    assert err.mean() < 1.5

    with pytest.raises(ValueError):
        pack_clip_batch(clips, 2, T, 30, yuv420=True)


def test_scorer_yuv420_features_close_to_rgb():
    """The fused scorer's penultimate features barely move under the I420
    roundtrip on smooth content (random-init logits are zero by design —
    zero-init final BN — so features are the sensitive observable)."""
    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18)
    sc_rgb = ClipScorer.random_init(cfg=cfg, dtype=jnp.float32)
    sc_yuv = ClipScorer(
        sc_rgb.variables, cfg=cfg, dtype=jnp.float32, upload_format="yuv420"
    )
    T, S = 4, 64
    clips = [_fake_clip_entries(T)]
    crops_r, boxes, lm5, valid = pack_clip_batch(clips, 1, T, S)
    crops_y, _, _, _ = pack_clip_batch(clips, 1, T, S, yuv420=True)
    _, _, f_rgb = sc_rgb.score_with_features(crops_r, boxes, lm5, valid)
    _, _, f_yuv = sc_yuv.score_with_features(crops_y, boxes, lm5, valid)
    denom = np.linalg.norm(f_rgb) + 1e-9
    assert np.linalg.norm(f_yuv - f_rgb) / denom < 0.03


def test_engine_with_yuv420_scorer_scores_clips():
    from stdd_tpu.runtime.engine import StreamingEngine
    from tests.test_engine import PIPE, SMALL_CFG, make_fake_detector

    scorer = ClipScorer.random_init(cfg=SMALL_CFG, dtype=jnp.float32,
                                    upload_format="yuv420")
    eng = StreamingEngine(
        scorer, make_fake_detector(), cfg=PIPE, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
    )
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (240, 320, 3), np.uint8)
    scored = []
    for _ in range(30):
        scored += eng.step(frame)
    scored += eng.flush()
    assert len(scored) >= 2
    for tid, p in scored:
        assert 0.0 <= p <= 1.0


def test_score_dense_yuv420_matches_rgb_closely():
    """Offline dense-window path: planar track buffer, windows sliced on
    device, decode inside the scorer — probs track the rgb path."""
    from stdd_tpu.runtime.packing import pack_track

    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18)
    sc_rgb = ClipScorer.random_init(cfg=cfg, dtype=jnp.float32)
    sc_yuv = ClipScorer(
        sc_rgb.variables, cfg=cfg, dtype=jnp.float32, upload_format="yuv420"
    )
    entries = _fake_clip_entries(10, size=90)
    starts = np.arange(0, 6, dtype=np.int32)
    f_r, b_r, l_r = pack_track(entries, 96)
    f_y, b_y, l_y = pack_track(entries, 96, yuv420=True)
    assert f_y.shape == (10, 144, 96)
    np.testing.assert_array_equal(b_r, b_y)
    p_r = sc_rgb.score_dense(f_r, b_r, l_r, starts, batch=4, clip_size=4)
    p_y = sc_yuv.score_dense(f_y, b_y, l_y, starts, batch=4, clip_size=4)
    np.testing.assert_allclose(p_y, p_r, atol=0.02)


def test_scorer_rejects_unknown_upload_format():
    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18)
    with pytest.raises(ValueError):
        ClipScorer.random_init(cfg=cfg, upload_format="nv12")


def test_scorer_rejects_mispacked_crops_loudly():
    """A facade that forgets to forward upload_format must fail with a clear
    error, not decode RGB bytes as I420."""
    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18)
    sc = ClipScorer.random_init(cfg=cfg, dtype=jnp.float32, upload_format="yuv420")
    T, S = 4, 64
    crops_rgb, boxes, lm5, valid = pack_clip_batch([_fake_clip_entries(T)], 1, T, S)
    with pytest.raises(ValueError, match="yuv420"):
        sc.score(crops_rgb, boxes, lm5, valid)
    sc_rgb = ClipScorer(sc.variables, cfg=cfg, dtype=jnp.float32)
    crops_yuv, _, _, _ = pack_clip_batch([_fake_clip_entries(T)], 1, T, S, yuv420=True)
    with pytest.raises(ValueError, match="rgb"):
        sc_rgb.score(crops_yuv, boxes, lm5, valid)


def test_feature_capture_facade_forwards_upload_format():
    from stdd_tpu.eval.features import FeatureCaptureScorer
    from stdd_tpu.runtime.packing import upload_format_of

    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18)
    sc = ClipScorer.random_init(cfg=cfg, dtype=jnp.float32, upload_format="yuv420")
    assert upload_format_of(FeatureCaptureScorer(sc)) == "yuv420"
    assert upload_format_of(object()) == "rgb"
