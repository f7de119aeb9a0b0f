"""Eval-only int8 dynamic-quant conv path (serving knob for the wide
stages s3-s5; config.I3DConfig.int8_stages). Exactness is pinned against an
int64 numpy reference over the SAME quantized integers — the int8 conv is
integer math, so after dequant the only tolerance needed is float32
multiply rounding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.models.i3d import I3D, Conv3dBN


def _np_int_conv(xq, wq, stride, pad):
    """int64 direct 3D convolution of quantized integers [B,T,H,W,C]·
    [kt,kh,kw,C,F] — the ground truth the MXU's s32 accumulator must match."""
    B, T, H, W, C = xq.shape
    kt, kh, kw, _, F = wq.shape
    xp = np.pad(xq.astype(np.int64),
                [(0, 0)] + [(p[0], p[1]) for p in pad] + [(0, 0)])
    st, sh, sw_ = stride
    To = (xp.shape[1] - kt) // st + 1
    Ho = (xp.shape[2] - kh) // sh + 1
    Wo = (xp.shape[3] - kw) // sw_ + 1
    out = np.zeros((B, To, Ho, Wo, F), np.int64)
    w64 = wq.astype(np.int64)
    for t in range(To):
        for i in range(Ho):
            for j in range(Wo):
                patch = xp[:, t * st:t * st + kt, i * sh:i * sh + kh,
                           j * sw_:j * sw_ + kw, :]
                out[:, t, i, j, :] = np.tensordot(
                    patch, w64, axes=([1, 2, 3, 4], [0, 1, 2, 3]))
    return out


@pytest.mark.parametrize("kernel,stride", [((1, 1, 1), (1, 1, 1)),
                                           ((1, 3, 3), (1, 2, 2)),
                                           ((3, 1, 1), (1, 1, 1))])
def test_int8_conv_matches_int64_reference(kernel, stride):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 6, 6, 8).astype(np.float32))
    pad = [(k // 2, k // 2) for k in kernel]
    mod = Conv3dBN(features=5, kernel=kernel, stride=stride, padding=pad,
                   int8=True)
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    out = np.asarray(mod.apply(v, x, train=False, mutable=False))

    # replicate the quantization EXACTLY (same ops as _int8_conv)
    w = np.asarray(v["params"]["conv"]["kernel"])
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2, 3)), 1e-8) / 127.0
    wq = np.asarray(jnp.round(jnp.asarray(w / sw)))
    sx = max(float(np.abs(np.asarray(x)).max()), 1e-8) / 127.0
    xq = np.asarray(jnp.clip(jnp.round(jnp.asarray(np.asarray(x) / sx)),
                             -127, 127))
    acc = _np_int_conv(xq, wq, stride, pad)
    want = acc.astype(np.float32) * (sx * sw).astype(np.float32)

    # apply the module's eval-BN affine (running stats: mean 0 var 1, scale 1
    # bias 0 at init) — i.e. identity up to eps
    scale = 1.0 / np.sqrt(1.0 + mod.bn_eps)
    np.testing.assert_allclose(out, want * scale, rtol=1e-5, atol=1e-5)


def test_i3d_int8_stages_wiring_and_accuracy():
    """int8_stages=('s3','s4','s5'): identical parameter tree (checkpoint
    interchange), and on a small random-init model the probabilities stay
    close to the float path — the quantization-error envelope, not exact."""
    cfg = I3DConfig(num_frames=4, crop_size=32)
    cfg8 = I3DConfig(num_frames=4, crop_size=32,
                     int8_stages=("s3", "s4", "s5"))
    m = I3D(cfg=cfg)
    m8 = I3D(cfg=cfg8)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 32, 32, 3)
                    .astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # same tree — int8 is a compute path, not a parameterization
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m8.init(jax.random.PRNGKey(0), x, train=False))
    lf = np.asarray(m.apply(v, x, train=False))
    l8 = np.asarray(m8.apply(v, x, train=False))
    pf = 1 / (1 + np.exp(-lf))
    p8 = 1 / (1 + np.exp(-l8))
    assert np.isfinite(l8).all()
    assert np.abs(pf - p8).max() < 0.05, (pf, p8)

    # train-mode must ignore int8 entirely (bit-identical to the float path)
    lt, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
    lt8, _ = m8.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(lt), np.asarray(lt8))


def test_clip_scorer_int8_knob():
    """The serving CLIs' --int8 flag (ClipScorer(int8=True)) must enable the
    measured-beneficial stages only (s3-s5) and still produce valid scores."""
    from stdd_tpu.runtime.classifier import ClipScorer

    cfg = I3DConfig(num_frames=4, crop_size=32)
    scorer = ClipScorer.random_init(cfg=cfg, dtype=jnp.float32, int8=True)
    assert scorer.cfg.int8_stages == ("s3", "s4", "s5")

    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.randint(0, 255, (1, 4, 48, 48, 3), np.uint8))
    boxes = jnp.tile(jnp.asarray([[4.0, 4.0, 44.0, 44.0]], jnp.float32),
                     (1, 4, 1))[None][0].reshape(1, 4, 4)
    lm5 = jnp.tile(jnp.asarray(
        [[14, 18], [30, 18], [22, 26], [16, 34], [29, 34]], jnp.float32),
        (1, 4, 1, 1))
    valid = jnp.ones((1,), bool)
    p = np.asarray(scorer.score(crops, boxes, lm5, valid))
    assert np.isfinite(p).all() and (p > 0).all() and (p < 1).all()

    # an explicit cfg with int8_stages set is left untouched
    pre = I3DConfig(num_frames=4, crop_size=32, int8_stages=("s4",))
    s2 = ClipScorer.random_init(cfg=pre, dtype=jnp.float32, int8=True)
    assert s2.cfg.int8_stages == ("s4",)
