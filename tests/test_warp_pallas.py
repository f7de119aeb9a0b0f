"""Pallas warp kernel parity tests (interpret mode on CPU; the compiled
kernel is exercised on real TPU by bench.py / the scorer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.ops.align import STD_POINTS_256, similarity_cv2, warp_clip_bilinear
from stdd_tpu.ops.warp_pallas import (
    BAND,
    pack_warp_params,
    rotation_fits_band,
    warp_clip_pallas,
)


def _setup(seed=0, T=4, H=128, W=128, S=96, rot_scale=0.35):
    rng = np.random.RandomState(seed)
    crops = rng.randint(0, 255, (T, H, W, 3), np.uint8)
    diffs = np.stack([rng.randint(0, 20, T), rng.randint(0, 20, T)], 1).astype(np.float32)
    src = (STD_POINTS_256 * rot_scale + np.array([15, 10]) + rng.randn(5, 2)).astype(np.float32)
    tfm, _ = similarity_cv2(jnp.asarray(src), jnp.asarray(STD_POINTS_256 * S / 256))
    return crops, diffs, tfm, S


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_warp_matches_xla_gather(seed):
    crops, diffs, tfm, S = _setup(seed)
    assert rotation_fits_band(np.asarray(tfm)[None], S)
    want = np.asarray(warp_clip_bilinear(jnp.asarray(crops), tfm, jnp.asarray(diffs), S))
    params = pack_warp_params(tfm, jnp.asarray(diffs))
    got = np.asarray(
        warp_clip_pallas(jnp.asarray(crops), params, out_size=S, interpret=True)
    )
    err = np.abs(got - want)
    assert err.max() < 1.0, err.max()   # matmul accumulation-order rounding
    assert err.mean() < 0.25


def test_zero_border_semantics():
    """Out-of-crop samples must be exactly zero (cv2 BORDER_CONSTANT)."""
    crops = np.full((1, 64, 64, 3), 255, np.uint8)
    # translate far outside
    params = jnp.asarray([[1.0, 0.0, 200.0, 0.0, 1.0, 200.0, 0, 0]], jnp.float32)
    out = np.asarray(warp_clip_pallas(jnp.asarray(crops), params, out_size=32, interpret=True))
    assert out.max() == 0.0


def test_identity_transform():
    rng = np.random.RandomState(1)
    crops = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
    params = jnp.zeros((2, 8), jnp.float32).at[:, 0].set(1.0).at[:, 4].set(1.0)
    out = np.asarray(warp_clip_pallas(jnp.asarray(crops), params, out_size=32, interpret=True))
    np.testing.assert_allclose(out, crops[:, :32, :32].astype(np.float32), atol=1e-3)


def test_rotation_envelope_check():
    # identity fits easily
    ident = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    assert rotation_fits_band(ident[None], 224)
    # 45° rotation does not
    c = s = np.cos(np.pi / 4)
    rot = np.array([[c, -s, 0], [s, c, 0]], np.float32)
    assert not rotation_fits_band(rot[None], 224)


def test_scorer_pallas_path_interpret_matches_gather():
    """ClipScorer's Pallas align path vs its XLA path (tiny model, CPU
    interpret mode)."""
    from stdd_tpu.config import I3DConfig
    from stdd_tpu.runtime.classifier import ClipScorer
    import stdd_tpu.ops.warp_pallas as wp
    import functools

    cfg = I3DConfig(num_frames=4, crop_size=64)
    rng = np.random.RandomState(0)
    crops = rng.randint(0, 255, (2, 4, 96, 96, 3), np.uint8)
    boxes = np.tile(np.array([5, 5, 90, 90], np.float32), (2, 4, 1))
    lm5 = np.tile((np.asarray(STD_POINTS_256) * 0.3 + 10).astype(np.float32), (2, 4, 1, 1))
    valid = np.ones(2, bool)

    s_gather = ClipScorer.random_init(cfg=cfg, dtype=jnp.float32, use_pallas_warp=False)
    p_ref = s_gather.score(crops, boxes, lm5, valid)

    orig = wp.warp_clip_pallas
    try:
        wp.warp_clip_pallas = functools.partial(orig, interpret=True)
        import stdd_tpu.runtime.classifier as clf

        clf.warp_clip_pallas = wp.warp_clip_pallas
        s_pallas = ClipScorer.random_init(cfg=cfg, dtype=jnp.float32, use_pallas_warp=True)
        s_pallas.variables = s_gather.variables
        p_pal = s_pallas.score(crops, boxes, lm5, valid)
    finally:
        wp.warp_clip_pallas = orig
        import stdd_tpu.runtime.classifier as clf

        clf.warp_clip_pallas = orig
    np.testing.assert_allclose(p_pal, p_ref, atol=5e-3)


def test_scorer_rotation_envelope_falls_back_to_gather():
    """A heavily rotated batch must leave the Pallas band and take the exact
    gather branch in-graph — outputs then match the gather scorer bitwise."""
    from stdd_tpu.config import I3DConfig
    from stdd_tpu.runtime.classifier import ClipScorer
    import stdd_tpu.ops.warp_pallas as wp
    import stdd_tpu.runtime.classifier as clf
    import functools

    cfg = I3DConfig(num_frames=4, crop_size=64)
    rng = np.random.RandomState(1)
    crops = rng.randint(0, 255, (2, 4, 96, 96, 3), np.uint8)
    boxes = np.tile(np.array([5, 5, 90, 90], np.float32), (2, 4, 1))
    # rotate the landmark constellation 45 deg about its center → the fit
    # produces a rotation far outside the band-64 envelope
    base = (np.asarray(STD_POINTS_256) * 0.3 + 10).astype(np.float32)
    ctr = base.mean(0, keepdims=True)
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = (base - ctr) @ np.array([[c, s], [-s, c]], np.float32) + ctr
    lm5 = np.tile(rot, (2, 4, 1, 1))
    valid = np.ones(2, bool)

    s_gather = ClipScorer.random_init(cfg=cfg, dtype=jnp.float32, use_pallas_warp=False)
    p_ref = s_gather.score(crops, boxes, lm5, valid)

    orig = wp.warp_clip_pallas
    try:
        clf.warp_clip_pallas = functools.partial(orig, interpret=True)
        s_pallas = ClipScorer.random_init(
            cfg=cfg, dtype=jnp.float32, use_pallas_warp=True, warp_band=32
        )
        s_pallas.variables = s_gather.variables
        p_pal = s_pallas.score(crops, boxes, lm5, valid)
    finally:
        clf.warp_clip_pallas = orig
    # the cond must have selected the gather branch → exact agreement
    np.testing.assert_allclose(p_pal, p_ref, atol=1e-6)


@pytest.mark.parametrize("H", [100, 24])
def test_pallas_warp_unaligned_height(H):
    """Crop heights that are not multiples of 8 (or smaller than the band)
    must match the gather path: the kernel's 8-aligned band-start clamp used
    to silently drop up to H%8 bottom source rows (and computed a negative
    slice start for H < band). The wrapper now zero-pads H — identical to
    the gather's zero canvas."""
    crops, diffs, tfm, S = _setup(seed=1, H=H, W=128, S=64, rot_scale=0.2)
    want = np.asarray(warp_clip_bilinear(jnp.asarray(crops), tfm, jnp.asarray(diffs), S))
    params = pack_warp_params(tfm, jnp.asarray(diffs))
    got = np.asarray(
        warp_clip_pallas(jnp.asarray(crops), params, out_size=S, interpret=True)
    )
    err = np.abs(got - want)
    assert err.max() < 1.0, (H, err.max())
    assert err.mean() < 0.25
