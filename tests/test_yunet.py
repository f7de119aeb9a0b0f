"""YuNet-on-XLA parity tests against OpenCV's C++ engine (the reference's
execution backend, preprocessing/yunet/yunet.py:47)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stdd_tpu.models.onnx_jax import OnnxModule
from stdd_tpu.models.yunet import DEFAULT_MODEL, YuNetTPU
from stdd_tpu.ops.nms import iou_matrix_xywh, nms_fixed

import jax.numpy as jnp


def _blob_image(rng):
    img = rng.randint(0, 255, (320, 320, 3), np.uint8)
    for _ in range(6):
        x, y = rng.randint(0, 260, 2)
        s = rng.randint(20, 60)
        cv2.ellipse(
            img, (x + s // 2, y + s // 2), (s // 2, int(s / 1.5)), 0, 0, 360,
            (int(rng.randint(100, 220)),) * 3, -1,
        )
        cv2.circle(img, (x + s // 3, y + s // 3), max(2, s // 10), (30, 30, 30), -1)
        cv2.circle(img, (x + 2 * s // 3, y + s // 3), max(2, s // 10), (30, 30, 30), -1)
    return img


def test_backbone_parity_with_cv2dnn():
    m = OnnxModule.from_file(DEFAULT_MODEL)
    rng = np.random.RandomState(0)
    blob = rng.randint(0, 255, (1, 3, 320, 320)).astype(np.float32)
    out = m(blob)
    net = cv2.dnn.readNet(DEFAULT_MODEL)
    net.setInput(blob)
    names = list(out.keys())
    ref = net.forward(names)
    for k, r in zip(names, ref):
        np.testing.assert_allclose(np.asarray(out[k]), r, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [2, 8, 12, 18])
def test_detections_match_facedetectoryn(seed):
    thr = 0.05
    ref_det = cv2.FaceDetectorYN.create(DEFAULT_MODEL, "", (320, 320), thr, 0.3, 5000)
    mine = YuNetTPU(conf_threshold=thr)
    rng = np.random.RandomState(seed)
    img = _blob_image(rng)
    _, ref = ref_det.detect(img)
    ref = np.empty((0, 15), np.float32) if ref is None else ref
    got = mine.detect_np(img)

    # every reference detection must have a close match of ours (IoU>0.9,
    # score within 2e-3); exact ordering can differ on score ties
    matched = 0
    for r in ref:
        if len(got) == 0:
            break
        iou = np.asarray(
            iou_matrix_xywh(jnp.asarray(r[None, :4]), jnp.asarray(got[:, :4]))
        )[0]
        j = int(np.argmax(iou))
        if iou[j] > 0.9 and abs(got[j, 14] - r[14]) < 2e-3:
            matched += 1
    assert len(ref) > 0, "oracle produced no detections; fixture too weak"
    assert matched >= 0.9 * len(ref), (matched, len(ref))


def test_nms_fixed_basic():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 10, 10]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, mask = nms_fixed(boxes, scores, 0.3, 0.1, 3)
    assert list(np.asarray(keep)[np.asarray(mask)]) == [0, 2]


def test_nms_score_threshold_filters_all():
    boxes = jnp.ones((5, 4), jnp.float32)
    scores = jnp.full((5,), 0.05)
    keep, mask = nms_fixed(boxes, scores, 0.3, 0.6, 4)
    assert not np.asarray(mask).any()


def test_batched_detect_shapes():
    mine = YuNetTPU(conf_threshold=0.6, top_k=32)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (2, 320, 320, 3), np.uint8)
    dets, mask = mine.detect(frames)
    assert dets.shape == (2, 32, 15)
    assert mask.shape == (2, 32)


def test_scrfd_backbone_parity_with_cv2dnn():
    from stdd_tpu.models.scrfd import DEFAULT_MODEL as SCRFD_MODEL, SCRFDDetector

    m = SCRFDDetector(conf_threshold=0.3, top_k=32)
    rng = np.random.RandomState(0)
    blob = (rng.randn(1, 3, 320, 320) * 20).astype(np.float32)
    out = m.module(blob)
    net = cv2.dnn.readNet(SCRFD_MODEL)
    net.setInput(blob)
    names = list(out.keys())
    ref = net.forward(names)
    for k, r in zip(names, ref):
        np.testing.assert_allclose(np.asarray(out[k]), r, rtol=1e-3, atol=1e-4)


def test_scrfd_detect_shapes():
    from stdd_tpu.models.scrfd import SCRFDDetector

    m = SCRFDDetector(conf_threshold=0.5, top_k=16)
    frames = np.random.RandomState(1).randint(0, 255, (2, 320, 320, 3), np.uint8)
    dets, mask = m.detect(frames)
    assert dets.shape == (2, 16, 15) and mask.shape == (2, 16)
    rows = m.detect_np(frames[0])
    assert rows.ndim == 2 and rows.shape[1] == 15
