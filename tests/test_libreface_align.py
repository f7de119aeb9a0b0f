"""LibreFace standalone alignment helper (reference
detect_mediapipe_image.py): FFHQ-quad math, rotation invariance, and the
CLI end to end on a rendered synthetic face with the shipped landmarker."""

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.data.libreface_align import (
    LEFT_EYE_IDX, LIPS_IDX, RIGHT_EYE_IDX, get_aligned_image, image_align,
)
from stdd_tpu.models.facemesh import canonical_mesh, render_faces

CANON = canonical_mesh()


def _lm72(dense):
    return np.concatenate(
        [dense[RIGHT_EYE_IDX], dense[LEFT_EYE_IDX], dense[LIPS_IDX]], axis=0)


def _face_frame(angle_deg=0.0, size=360):
    """Rendered face pasted into a frame, plus its TRUE landmark positions."""
    import cv2

    img = np.asarray(render_faces(
        jnp.zeros((1, 4)), jnp.zeros((1, 6)), jnp.zeros((1, 8)), size=128))[0]
    face = (img * 255).astype(np.uint8)
    frame = np.full((size, size, 3), 110, np.uint8)
    fs, off = 200, 80
    frame[off:off + fs, off:off + fs] = cv2.resize(face, (fs, fs))
    pts = CANON * fs + off                      # canonical → frame coords
    if angle_deg:
        M = cv2.getRotationMatrix2D((size / 2, size / 2), angle_deg, 1.0)
        frame = cv2.warpAffine(frame, M, (size, size), borderValue=(110, 110, 110))
        pts = pts @ M[:, :2].T + M[:, 2]
    return frame, pts.astype(np.float32)


def test_image_align_rotation_invariant():
    """Aligning an upright face and the same face rolled 25° must produce
    nearly the same crop — the FFHQ quad absorbs the roll."""
    f0, p0 = _face_frame(0.0)
    f1, p1 = _face_frame(25.0)
    a0 = image_align(f0, _lm72(p0), output_size=128).astype(np.float32)
    a1 = image_align(f1, _lm72(p1), output_size=128).astype(np.float32)
    assert a0.shape == (128, 128, 3)
    # compare the central face region (borders may differ from frame edges)
    c0, c1 = a0[24:104, 24:104], a1[24:104, 24:104]
    corr = np.corrcoef(c0.ravel(), c1.ravel())[0, 1]
    assert corr > 0.95, corr
    assert np.abs(c0 - c1).mean() < 12.0


def test_get_aligned_image_and_cli(tmp_path):
    import cv2

    from stdd_tpu.data.libreface_align import main

    frame, _ = _face_frame(0.0)
    p = tmp_path / "face.png"
    cv2.imwrite(str(p), frame[:, :, ::-1])

    res = get_aligned_image(str(p), out_size=256)
    assert res is not None, "detector must find the rendered face"
    aligned, lms = res
    assert aligned.shape == (256, 256, 3)
    assert lms["landmarks"].shape == (478, 2)
    assert lms["lips"].shape == (40, 2)
    # the aligned crop is face-dominated: mostly skin-ish, not background
    assert aligned.mean() > 60

    rc = main(["--image", str(p), "--out_dir", str(tmp_path / "out")])
    assert rc == 0
    assert (tmp_path / "out" / "face_aligned.png").exists()
    assert (tmp_path / "out" / "face_landmark.npy").exists()
