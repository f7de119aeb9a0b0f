"""C++ native extension tests: fused quality metric and area-resize packing
vs the numpy/cv2 references."""

import numpy as np
import pytest

from stdd_tpu.native import available, crop_lapvar_halfres, resize_area_pack
from stdd_tpu.ops.quality import crop_quality, half_res_area, variance_of_laplacian_np

pytestmark = pytest.mark.skipif(not available(), reason="native lib not built")


@pytest.mark.parametrize("shape", [(280, 260), (64, 64), (33, 47), (2, 2)])
def test_lapvar_matches_numpy(shape):
    rng = np.random.RandomState(0)
    crop = rng.randint(0, 255, shape + (3,), np.uint8)
    want = variance_of_laplacian_np(half_res_area(crop))
    got = crop_lapvar_halfres(crop)
    assert got == pytest.approx(want, rel=1e-3)


def test_crop_quality_uses_native():
    rng = np.random.RandomState(1)
    crop = rng.randint(0, 255, (120, 110, 3), np.uint8)
    w, ms, lap = crop_quality(crop)
    want_lap = variance_of_laplacian_np(half_res_area(crop))
    assert lap == pytest.approx(want_lap, rel=1e-3)
    assert ms == 110


def test_resize_pack_matches_cv2_area():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(2)
    for (h, w), scale in [((100, 120), 0.5), ((150, 90), 0.37), ((64, 64), 0.99)]:
        src = rng.randint(0, 255, (h, w, 3), np.uint8)
        s = 128
        dst = np.zeros((s, s, 3), np.uint8)
        assert resize_area_pack(src, dst, scale)
        oh, ow = max(1, int(h * scale)), max(1, int(w * scale))
        ref = cv2.resize(src, (ow, oh), interpolation=cv2.INTER_AREA)
        err = np.abs(dst[:oh, :ow].astype(int) - ref.astype(int))
        assert err.max() <= 1, (scale, err.max())
        assert dst[oh:, :].max() == 0 and dst[:, ow:].max() == 0
