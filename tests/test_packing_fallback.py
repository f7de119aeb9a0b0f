"""Degradation chain of the slot packer's resize:
cv2.INTER_AREA (fast SIMD) → native C++ kernel → pure-numpy area resize.

The last link matters: an environment with neither cv2 nor the built .so
must keep streaming (slowly), not raise ImportError from the dispatch
worker on every oversized crop."""

import sys

import numpy as np
import pytest

from stdd_tpu.runtime.packing import _area_resize_np, _pack_entry


@pytest.mark.parametrize("shape,scale", [((100, 120), 0.5), ((150, 90), 0.37),
                                         ((64, 64), 0.99), ((431, 433), 0.52)])
def test_area_resize_np_matches_cv2(shape, scale):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(3)
    src = rng.randint(0, 255, shape + (3,), np.uint8)
    oh, ow = max(1, int(shape[0] * scale)), max(1, int(shape[1] * scale))
    got = _area_resize_np(src, oh, ow)
    ref = cv2.resize(src, (ow, oh), interpolation=cv2.INTER_AREA)
    err = np.abs(got.astype(int) - ref.astype(int))
    assert err.max() <= 1, (shape, scale, err.max())


def test_pack_entry_survives_no_cv2_no_native(monkeypatch):
    """cv2 unimportable AND the native kernel unavailable → the numpy path
    fills the slot instead of re-raising ImportError."""
    import cv2  # the real one, for the expectation

    import stdd_tpu.native as native

    monkeypatch.setitem(sys.modules, "cv2", None)  # import cv2 → ImportError
    monkeypatch.setattr(native, "resize_area_pack", lambda *a, **k: False)

    rng = np.random.RandomState(4)
    crop = rng.randint(0, 255, (300, 280, 3), np.uint8)
    entry = dict(crop=crop, big_box=np.array([0, 0, 280, 300], np.float32),
                 lm5=rng.rand(5, 2).astype(np.float32) * 200)
    S, s = 128, 128 / 300
    dst = np.zeros((S, S, 3), np.uint8)
    box, lm5 = _pack_entry(entry, dst, s)

    oh, ow = max(1, int(300 * s)), max(1, int(280 * s))
    ref = cv2.resize(crop, (ow, oh), interpolation=cv2.INTER_AREA)
    err = np.abs(dst[:oh, :ow].astype(int) - ref.astype(int))
    assert err.max() <= 1
    assert dst[oh:, :].size == 0 or dst[oh:, :].max() == 0
    assert dst[:, ow:].size == 0 or dst[:, ow:].max() == 0
    np.testing.assert_allclose(box, entry["big_box"] * s)
