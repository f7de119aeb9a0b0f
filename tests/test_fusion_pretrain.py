"""RGB fusion, feature dumping and LMK pretraining tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.config import I3DConfig, PipelineConfig
from stdd_tpu.eval.features import dump_video_features, load_feature_clips
from stdd_tpu.models.dual_encoder import DualEncoderAU_LMK, LMKDisc
from stdd_tpu.models.dual_rgb import DualEncoderRGB, GatedMoE, masked_mean
from stdd_tpu.models.i3d import I3D
from stdd_tpu.ops.align import STD_POINTS_256
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.train.pretrain import make_shuffled, pretrain_lmk, remap_pretrained_to_lmk


def test_i3d_return_features():
    cfg = I3DConfig(num_frames=4, crop_size=32)
    m = I3D(cfg=cfg)
    x = jnp.zeros((2, 4, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    logits, feats = m.apply(v, x, train=False, return_features=True)
    assert logits.shape == (2, 1) and feats.shape == (2, 2048)


def test_dual_rgb_frozen_branch():
    model = DualEncoderRGB(au_dim=6, lmk_dim=10, vis_dim=32, d_model=16, depth=1, heads=2)
    A = jnp.ones((2, 4, 6))
    L = jnp.ones((2, 4, 10))
    R = jnp.ones((2, 4, 32))
    v = model.init(jax.random.PRNGKey(0), A, L, R)
    out = model.apply(v, A, L, R)
    assert out["bin_logits"].shape == (2,)
    assert out["z"].shape == (2, 48)

    # gradients must NOT flow into rgb_proj (frozen branch)
    def loss(params):
        o = model.apply({"params": params}, A, L, R)
        return jnp.sum(o["bin_logits"] ** 2)

    g = jax.grad(loss)(v["params"])
    assert float(jnp.abs(g["rgb_proj"]["kernel"]).max()) == 0.0
    assert float(max(jnp.abs(x).max() for x in jax.tree.leaves(g["au_enc"]))) > 0.0


def test_masked_mean():
    z = jnp.arange(12.0).reshape(1, 4, 3)
    pad = jnp.asarray([[False, False, True, True]])
    out = masked_mean(z, pad)
    np.testing.assert_allclose(np.asarray(out)[0], z[0, :2].mean(0), rtol=1e-6)


def test_gated_moe():
    m = GatedMoE()
    z_rgb = jnp.asarray([[2.0], [-2.0]])
    z_dual = jnp.asarray([[-1.0], [1.0]])
    v = m.init(jax.random.PRNGKey(0), z_rgb, z_dual)
    z, g = m.apply(v, z_rgb, z_dual)
    assert z.shape == (2, 1) and g.shape == (2, 1)
    assert (np.asarray(g) > 0).all() and (np.asarray(g) < 1).all()
    # fused prob is between the two expert probs
    p = 1 / (1 + np.exp(-np.asarray(z)))
    p_r = 1 / (1 + np.exp(-np.asarray(z_rgb)))
    p_d = 1 / (1 + np.exp(-np.asarray(z_dual)))
    lo = np.minimum(p_r, p_d) - 1e-6
    hi = np.maximum(p_r, p_d) + 1e-6
    assert ((p >= lo) & (p <= hi)).all()


def test_make_shuffled_preserves_set_and_padding():
    rng = jax.random.PRNGKey(0)
    X = jnp.asarray(np.random.RandomState(0).randn(3, 6, 4).astype(np.float32))
    lengths = jnp.asarray([6, 3, 1])
    Xs = np.asarray(make_shuffled(X, lengths, rng))
    X = np.asarray(X)
    for b, n in enumerate([6, 3, 1]):
        got = {tuple(r) for r in Xs[b, :n]}
        want = {tuple(r) for r in X[b, :n]}
        assert got == want, b
        np.testing.assert_array_equal(Xs[b, n:], X[b, n:])  # pads untouched
    # at least one row actually permuted
    assert not np.allclose(Xs[0], X[0])


def test_pretrain_learns_temporal_order():
    """Smooth trajectories are easy to distinguish from shuffles."""
    rng = np.random.RandomState(0)
    N, T, D = 256, 12, 20
    t = np.linspace(0, 1, T)[None, :, None]
    seqs = np.sin(2 * np.pi * (t * rng.uniform(0.5, 2.0, (N, 1, 1))
                               + rng.uniform(0, 1, (N, 1, D)))).astype(np.float32)
    lengths = np.full(N, T, np.int32)
    model = LMKDisc(lmk_dim=D, d_model=32, depth=1, heads=2)
    res = pretrain_lmk(model, seqs, lengths, epochs=6, batch=64, lr=3e-3,
                       log=lambda s: None)
    assert res["history"][-1]["acc"] > 0.8, res["history"]


def test_remap_pretrained_to_lmk():
    disc = LMKDisc(lmk_dim=10, d_model=16, depth=1, heads=2)
    vd = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 10)))
    dual = DualEncoderAU_LMK(au_dim=6, lmk_dim=10, d_model=16, depth=1, heads=2)
    vm = dual.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 6)), jnp.zeros((1, 4, 10)))
    merged = remap_pretrained_to_lmk(vd["params"], vm["params"])
    np.testing.assert_array_equal(
        merged["lmk_enc"]["proj"]["kernel"], vd["params"]["enc"]["proj"]["kernel"]
    )
    # au branch untouched
    np.testing.assert_array_equal(
        merged["au_enc"]["proj"]["kernel"], vm["params"]["au_enc"]["proj"]["kernel"]
    )


def test_feature_dump_roundtrip(tmp_path):
    pipe = PipelineConfig(clip_size=8, stride=4, detect_every=2, batch_clips=2,
                          min_face_side=5)
    scorer = ClipScorer.random_init(cfg=I3DConfig(num_frames=8, crop_size=64),
                                    dtype=jnp.float32)
    state = {"i": 0}

    def detect(frame):
        i = state["i"]
        state["i"] += 1
        lm = (STD_POINTS_256 * (50 / 256.0) + np.array([30 + i, 25])).reshape(-1)
        return np.asarray([[30 + i, 25, 50.0, 55.0, *lm, 0.95]], np.float32)

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (240, 320, 3), np.uint8)] * 30
    out = dump_video_features(
        scorer, frames, detect, cfg=pipe, crop_buffer=128,
        q_weighting=False, q_lap_hard=0.0,
        out_path=str(tmp_path / "v0.npz"),
    )
    assert out["feats"].shape[1] == 2048
    assert len(out["feats"]) == len(out["scores"]) >= 4
    clips = load_feature_clips([str(tmp_path / "v0.npz")], T=2)
    assert clips["rgb"].shape[1:] == (2, 2048)
    assert len(clips["rgb"]) >= 1


def test_feature_scorer_rejects_device_resident_engine():
    """FeatureCaptureScorer has no score_windows program: constructing a
    device-ring engine on it must fail at construction (loudly), not on the
    dispatch worker at the first emitted window."""
    import pytest

    from stdd_tpu.eval.features import FeatureCaptureScorer
    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.runtime.engine import StreamingEngine

    scorer = ClipScorer.random_init(cfg=I3DConfig(num_frames=8, crop_size=64),
                                    dtype=jnp.float32)
    capture = FeatureCaptureScorer(scorer)
    with pytest.raises(ValueError, match="score_windows"):
        StreamingEngine(capture, lambda f: np.empty((0, 15), np.float32),
                        device_resident=True)
