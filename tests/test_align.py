"""Golden tests for the similarity solver and fused clip warp against the
reference implementation (numpy/cv2, imported read-only as an oracle)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.ops.align import (
    STD_POINTS_256,
    align_clip,
    similarity_cv2,
    std_points,
    transform_landmarks,
    warp_clip_bilinear,
)

REF = "/root/reference/altfreezing"


def _ref_warp():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from test_tools import warp_for_xray

    return warp_for_xray


def _face_like_points(rng, n=5):
    theta = rng.uniform(-0.4, 0.4)
    s = rng.uniform(0.5, 2.0)
    R = s * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    return STD_POINTS_256 @ R.T + rng.uniform(0, 80, 2) + rng.randn(5, 2) * 3.0


def test_std_points_match_reference():
    ref = _ref_warp()
    np.testing.assert_allclose(STD_POINTS_256, ref.std_points_256, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(std_points(224)), ref.std_points_256 * 224 / 256, rtol=1e-6
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_similarity_solver_matches_reference(seed):
    ref = _ref_warp()
    rng = np.random.RandomState(seed)
    src = _face_like_points(rng)
    dst = STD_POINTS_256.copy()
    ref_cv2, ref_trans = ref.get_similarity_transform_for_cv2(
        src.copy(), dst.copy()
    )
    got_cv2, got_trans = similarity_cv2(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(got_cv2), ref_cv2, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_trans), ref_trans, rtol=1e-3, atol=1e-3)


def test_transform_landmarks_matches_reference():
    ref = _ref_warp()
    rng = np.random.RandomState(7)
    src = _face_like_points(rng)
    _, trans = ref.get_similarity_transform_for_cv2(src.copy(), STD_POINTS_256.copy())
    lm = rng.uniform(0, 200, (68, 2))
    want = ref.transform_landmarks(lm, trans)
    got = transform_landmarks(jnp.asarray(lm), jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)


def test_warp_matches_cv2_warpaffine():
    """Fused paste+warp vs the reference's canvas + cv2.warpAffine
    (faster_crop_align_xray.py:77-89). cv2 uses 5-bit fixed-point bilinear →
    tolerance of a few intensity units."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    T, H, W, S = 4, 120, 110, 96
    canvas_h, canvas_w = 160, 150
    crops = rng.randint(0, 255, (T, H, W, 3), np.uint8)
    diffs = np.stack(
        [rng.randint(0, canvas_w - W, T), rng.randint(0, canvas_h - H, T)], axis=1
    )
    src = _face_like_points(rng) * 0.5
    tfm = np.asarray(
        similarity_cv2(jnp.asarray(src), jnp.asarray(STD_POINTS_256 * S / 256))[0]
    ).astype(np.float64)

    # reference path: paste into canvas, then cv2.warpAffine
    want = []
    for t in range(T):
        canvas = np.zeros((canvas_h, canvas_w, 3), np.uint8)
        x, y = diffs[t]
        canvas[y : y + H, x : x + W] = crops[t]
        want.append(cv2.warpAffine(canvas, tfm, (S, S)))
    want = np.stack(want).astype(np.float32)

    got = np.asarray(
        warp_clip_bilinear(jnp.asarray(crops), jnp.asarray(tfm), jnp.asarray(diffs), S)
    )
    err = np.abs(got - want)
    # cv2 rounds to uint8 and quantizes coords to 1/32 px
    assert np.mean(err) < 0.6, np.mean(err)
    assert np.percentile(err, 99) <= 4.0, np.percentile(err, 99)


def test_align_clip_end_to_end_matches_reference():
    """Whole-pipeline golden: FasterCropAlignXRay vs align_clip on a synthetic
    track (same union-box logic, one shared transform, warped images)."""
    cv2 = pytest.importorskip("cv2")
    sys.path.insert(0, REF)
    from test_tools.faster_crop_align_xray import FasterCropAlignXRay

    rng = np.random.RandomState(1)
    T, S = 6, 224
    Hc, Wc = 140, 130
    frames, infos = [], []
    for t in range(T):
        img = rng.randint(0, 255, (Hc, Wc, 3), np.uint8)
        x1, y1 = rng.randint(0, 40, 2)
        big_box = np.array([x1, y1, x1 + Wc, y1 + Hc], np.int64)
        lm5 = STD_POINTS_256 * 0.4 + np.array([20, 20]) + rng.randn(5, 2)
        lm68 = rng.uniform(10, 100, (68, 2))
        frames.append(img)
        infos.append((None, lm5, lm68, big_box))

    ref_align = FasterCropAlignXRay(size=S)
    want_lm68, want_imgs = ref_align(infos, frames)

    aligned, lm5_t, lm68_t, tfm = align_clip(
        jnp.asarray(np.stack(frames)),
        jnp.asarray(np.stack([i[3] for i in infos])),
        jnp.asarray(np.stack([i[1] for i in infos])),
        out_size=S,
        lm68=jnp.asarray(np.stack([i[2] for i in infos])),
    )
    np.testing.assert_allclose(np.asarray(lm68_t), want_lm68, rtol=1e-3, atol=0.15)
    err = np.abs(np.asarray(aligned) - want_imgs.astype(np.float32))
    assert np.mean(err) < 0.6, np.mean(err)
    assert np.percentile(err, 99) <= 4.0, np.percentile(err, 99)


def test_find_similarity_np_matches_jax():
    """The host-side numpy solver (dataset writer's --aligned mode) must
    reproduce the jittable solver exactly — same reference quirks included."""
    import numpy as np

    from stdd_tpu.ops.align import find_similarity, find_similarity_np

    rng = np.random.RandomState(3)
    for _ in range(6):
        src = rng.uniform(0, 250, (40, 2)).astype(np.float32)
        # similarity-ish target: rotate/scale/translate + noise
        th = rng.uniform(-0.5, 0.5)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                     np.float32) * rng.uniform(0.5, 1.5)
        dst = (src @ R.T + rng.uniform(-20, 20, (1, 2))
               + rng.normal(0, 1.5, src.shape)).astype(np.float32)
        T_np = find_similarity_np(src, dst)
        T_jx = np.asarray(find_similarity(src, dst))
        np.testing.assert_allclose(T_np, T_jx, rtol=1e-4, atol=1e-4)


def test_align_clip_host_matches_device_align():
    """align_clip_host (numpy + cv2, the --aligned dataset writer) must
    produce the same aligned clip as the jittable align_clip the serving
    scorer uses — one similarity per clip, union-canvas warp."""
    import numpy as np
    import pytest

    pytest.importorskip("cv2")
    import jax.numpy as jnp

    from stdd_tpu.ops.align import STD_POINTS_256, align_clip, align_clip_host

    rng = np.random.RandomState(5)
    T, S = 4, 96
    crops, boxes, lm5 = [], [], []
    for t in range(T):
        h, w = 150 + 4 * t, 140 + 3 * t
        crops.append(rng.randint(0, 255, (h, w, 3), np.uint8))
        x1, y1 = 30.0 + 2 * t, 40.0 + t
        boxes.append([x1, y1, x1 + w, y1 + h])
        lm5.append(STD_POINTS_256 * (90.0 / 256.0)
                   + np.array([15.0 + t, 20.0]) + rng.normal(0, 1.0, (5, 2)))
    boxes = np.asarray(boxes, np.float32)
    lm5 = np.asarray(lm5, np.float32)

    host = align_clip_host(crops, boxes, lm5, out_size=S)

    # device path needs equal-size zero-padded crops
    Hc = max(c.shape[0] for c in crops)
    Wc = max(c.shape[1] for c in crops)
    padded = np.zeros((T, Hc, Wc, 3), np.uint8)
    for t, c in enumerate(crops):
        padded[t, : c.shape[0], : c.shape[1]] = c
    dev, _, _, _ = align_clip(jnp.asarray(padded), jnp.asarray(boxes),
                              jnp.asarray(lm5), out_size=S)
    dev = np.asarray(dev)

    # bilinear-warp implementations differ in edge rounding: compare the
    # interior at a tight mean tolerance and a loose per-pixel one
    diff = np.abs(host[:, 4:-4, 4:-4].astype(np.float32)
                  - dev[:, 4:-4, 4:-4].astype(np.float32))
    assert float(diff.mean()) < 1.5, diff.mean()
    assert float(np.percentile(diff, 99)) < 12.0
