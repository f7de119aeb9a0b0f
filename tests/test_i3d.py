"""I3D-ResNet50 parity and shape tests.

The key test here converts randomly-initialized weights from the REFERENCE
torch model into flax variables and asserts logit parity of the forward pass
— the strongest available oracle given the reference ships no trained I3D
checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.models.i3d import I3D, normalize_clip, stage_temp_kernels
from stdd_tpu.utils.torch_convert import i3d_torch_to_flax


# Small network config for fast tests: 8 frames, 64px crops.
SMALL = I3DConfig(num_frames=8, crop_size=64)


def test_stage_temp_kernels():
    # reference resnet_helper.py:530-534 semantics
    assert stage_temp_kernels((3,), 3, 3) == (3, 3, 3)
    assert stage_temp_kernels((3, 1), 4, 4) == (3, 1, 3, 1)
    assert stage_temp_kernels((3, 1), 6, 6) == (3, 1, 3, 1, 3, 1)
    assert stage_temp_kernels((1, 3), 3, 3) == (1, 3, 1)
    assert stage_temp_kernels((3,), 4, 2) == (3, 3, 1, 1)


def test_forward_shape_and_param_count():
    model = I3D(cfg=SMALL)
    x = jnp.zeros((2, 8, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 1)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # I3D-R50 single-class: matches the reference's 104.2 MB fp32 checkpoint
    # (BASELINE.md model-size row): ~26.1M params.
    assert 25e6 < n_params < 28e6, n_params


def test_normalize_clip():
    x = jnp.full((1, 2, 4, 4, 3), 128, jnp.uint8)
    y = normalize_clip(x)
    expected = (128.0 - np.array([0.485, 0.456, 0.406]) * 255) / (
        np.array([0.229, 0.224, 0.225]) * 255
    )
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0], expected, rtol=1e-5)


@pytest.mark.parametrize("num_frames,crop", [(8, 64)])
def test_parity_with_reference_torch(num_frames, crop):
    """Forward-pass parity against the reference torch implementation with
    identical (randomly initialized) weights."""
    torch = pytest.importorskip("torch")
    from tests.oracles.ref_i3d import build_reference_i3d

    ref = build_reference_i3d(num_frames=num_frames, crop_size=crop, seed=0)
    variables = i3d_torch_to_flax(ref.state_dict())

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, num_frames, crop, crop).astype(np.float32)

    with torch.no_grad():
        ref_out = ref([torch.from_numpy(x)]).numpy()

    cfg = I3DConfig(num_frames=num_frames, crop_size=crop)
    model = I3D(cfg=cfg)
    x_jax = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # NCTHW -> NTHWC
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x_jax,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-4)


def test_train_mode_runs_and_updates_stats():
    model = I3D(cfg=SMALL)
    x = jnp.ones((2, 8, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape == (2, 1)
    # running stats must have moved away from init (mean 0)
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        variables["batch_stats"],
        mutated["batch_stats"],
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_bfloat16_forward_close_to_fp32():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64, 64, 3), jnp.float32)
    m32 = I3D(cfg=SMALL, dtype=jnp.float32)
    variables = m32.init(jax.random.PRNGKey(0), x, train=False)
    out32 = m32.apply(variables, x, train=False)
    m16 = I3D(cfg=SMALL, dtype=jnp.bfloat16)
    out16 = m16.apply(variables, x, train=False)
    assert jnp.abs(out32 - out16).max() < 0.2


def test_ftcn_stop_point_truncation():
    """stop_point=k removes stages s_k..s5 (reference
    i3d_temporal_var_fix_dropout_tt_cfg.py:315-330): the shipped
    ftcn_tt.yaml stop_point=5 keeps s2..s4 → 1024-ch time tokens."""
    import jax
    import numpy as np
    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.ftcn import FTCN

    x = np.zeros((1, 8, 64, 64, 3), np.float32)
    for stop_point, want_ch in [(5, 1024), (6, 2048), (4, 512)]:
        cfg = I3DConfig(num_frames=8, crop_size=64, stop_point=stop_point)
        m = FTCN(cfg=cfg)
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        head = v["params"]["head"]
        assert head["pos_embedding"].shape[-1] == want_ch, (stop_point, head["pos_embedding"].shape)
        top_stage = f"s{stop_point - 1}"
        assert any(k.startswith(top_stage) for k in v["params"]), (stop_point, list(v["params"]))
        assert not any(k.startswith(f"s{stop_point}") for k in v["params"])


def test_s2d_stem_exact_and_checkpoint_compatible():
    """Space-to-depth stem computes the identical conv (models/i3d.py
    Conv3dBN._s2d_conv) with an unchanged parameter tree."""
    import dataclasses

    import jax
    import numpy as np
    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.i3d import I3D

    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18)
    m0 = I3D(cfg=cfg)
    m1 = I3D(cfg=dataclasses.replace(cfg, s2d_stem=True))
    x = np.random.RandomState(0).rand(2, 4, 64, 64, 3).astype(np.float32)
    v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
    y0 = np.asarray(m0.apply(v0, x, train=False))
    y1 = np.asarray(m1.apply(v0, x, train=False))     # same variables!
    np.testing.assert_allclose(y1, y0, atol=1e-5)

    # gradient flows through the re-laid-out kernel (training-compatible)
    def loss(params, mdl):
        out = mdl.apply({"params": params, "batch_stats": v0["batch_stats"]},
                        x, train=False)
        return (out ** 2).sum()

    g0 = jax.grad(loss)(v0["params"], m0)
    g1 = jax.grad(loss)(v0["params"], m1)
    k0 = np.asarray(g0["s1"]["pathway0_stem"]["conv"]["kernel"])
    k1 = np.asarray(g1["s1"]["pathway0_stem"]["conv"]["kernel"])
    np.testing.assert_allclose(k1, k0, atol=1e-4)


def test_stem_t2_exact_and_checkpoint_compatible():
    """Temporal-pair packed stem (eval-only, BN folded into the kernel)
    computes the identical stem (models/i3d.py stem_forward_t2) with an
    unchanged parameter tree, including non-trivial BN statistics."""
    import dataclasses

    import jax
    import numpy as np
    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.i3d import I3D

    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18)
    m0 = I3D(cfg=cfg)
    m2 = I3D(cfg=dataclasses.replace(cfg, s2d_stem=True, stem_t2=True))
    rng = np.random.RandomState(1)
    x = rng.rand(2, 4, 64, 64, 3).astype(np.float32)
    v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial stem BN stats + affine so the fold is actually exercised
    bn = v0["batch_stats"]["s1"]["pathway0_stem"]["bn"]
    pbn = v0["params"]["s1"]["pathway0_stem"]["bn"]
    import jax.numpy as jnp

    F = bn["mean"].shape[0]
    v0["batch_stats"]["s1"]["pathway0_stem"]["bn"] = {
        "mean": jnp.asarray(rng.randn(F), jnp.float32) * 0.3,
        "var": jnp.asarray(rng.rand(F) + 0.5, jnp.float32),
    }
    v0["params"]["s1"]["pathway0_stem"]["bn"] = {
        "scale": jnp.asarray(rng.randn(F), jnp.float32),  # incl. negatives
        "bias": jnp.asarray(rng.randn(F), jnp.float32) * 0.1,
    }
    y0 = np.asarray(m0.apply(v0, x, train=False))
    y2 = np.asarray(m2.apply(v0, x, train=False))     # same variables!
    np.testing.assert_allclose(y2, y0, atol=2e-5)

    # init through the t2 branch produces the identical tree (so either
    # branch can create or consume a checkpoint)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    tree0 = jax.tree_util.tree_structure(v0)
    tree2 = jax.tree_util.tree_structure(v2)
    assert tree0 == tree2
    for (p0, a0), (p2, a2) in zip(
        jax.tree_util.tree_leaves_with_path(v0), jax.tree_util.tree_leaves_with_path(v2)
    ):
        assert a0.shape == a2.shape, (p0, a0.shape, a2.shape)

    # train path with t2 requested falls back to the plain stem (t2 is
    # eval-only) and still trains: batch_stats update
    _, mut = m2.apply(v2, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert "s1" in mut["batch_stats"]


def test_stem_t2_odd_T_falls_back():
    """Odd clip length can't pair-pack; the plain s2d path must serve."""
    import dataclasses

    import jax
    import numpy as np
    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.i3d import I3D

    cfg = I3DConfig(num_frames=5, crop_size=64, depth=18)
    m0 = I3D(cfg=cfg)
    m2 = I3D(cfg=dataclasses.replace(cfg, s2d_stem=True, stem_t2=True))
    x = np.random.RandomState(2).rand(1, 5, 64, 64, 3).astype(np.float32)
    v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
    y0 = np.asarray(m0.apply(v0, x, train=False))
    y2 = np.asarray(m2.apply(v0, x, train=False))
    np.testing.assert_allclose(y2, y0, atol=1e-5)
