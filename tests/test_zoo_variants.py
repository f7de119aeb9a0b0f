"""Model-zoo variants: ResUNet3D, VideoiT, SpatialTemporalTransformer,
ResNet2D, FTCN head patch pools, multigrid schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stdd_tpu.config import I3DConfig
from stdd_tpu.models import build_model


def test_resunet_masks_and_verdict():
    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18)
    m = build_model("resunet", cfg=cfg)
    x = np.random.RandomState(0).rand(2, 4, 64, 64, 3).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    masks, out = m.apply(v, x, train=False)
    # masks at stem resolution (H/4), one channel per label; sigmoid range
    assert masks.shape == (2, 4, 16, 16, 2)
    assert float(masks.min()) >= 0.0 and float(masks.max()) <= 1.0
    assert out.shape == (2, 4 * 2) and np.all((out >= 0) & (out <= 1))
    # light variant has half the decoder convs
    ml = build_model("resunet_light", cfg=cfg)
    vl = ml.init(jax.random.PRNGKey(0), x, train=False)
    n_full = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    n_light = sum(x.size for x in jax.tree_util.tree_leaves(vl["params"]))
    assert n_light < n_full


def test_resunet_freeze_mask():
    from stdd_tpu.models.unet3d import freeze_mask_by_prefix, unfreeze_mask

    params = {"s1/conv": {"w": jnp.zeros(3)}, "t4_rotate/conv1": {"w": jnp.zeros(3)}}
    mask = freeze_mask_by_prefix(params, ["s1"])
    assert mask["s1/conv"]["w"] is False or mask["s1/conv"]["w"] == False  # noqa: E712
    assert mask["t4_rotate/conv1"]["w"] == True  # noqa: E712
    un = unfreeze_mask(params)
    assert all(jax.tree_util.tree_leaves(un))


# num_frames=4 with t_pool_after_s2=2 → T=2 time tokens; crop 64 → stem /4
# then s3,s4 stride-2 pools → 4×4 spatial grid
@pytest.mark.parametrize("ptype,n_expected", [
    ("time", 2), ("spatial", 16), ("random", 2), ("random_avg", 2), ("all", 32),
])
def test_ftcn_patch_types(ptype, n_expected):
    from stdd_tpu.models.ftcn import FTCN

    cfg = I3DConfig(num_frames=4, crop_size=64, depth=18, stop_point=5)
    m = FTCN(cfg=cfg, patch_type=ptype, random_select=True, patch_k=1)
    x = np.random.RandomState(0).rand(1, 4, 64, 64, 3).astype(np.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "patch": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 1) and np.isfinite(np.asarray(y)).all()
    assert v["params"]["head"]["pos_embedding"].shape[1] == n_expected + 1
    if ptype in ("random", "random_avg"):
        # train-time randomness draws from the patch stream
        y1, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                        rngs={"patch": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(0)})
        y2, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                        rngs={"patch": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(0)})
        assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_videoit_shapes():
    m = build_model("videoit", image_size=32, patch_size=8, num_frames=4,
                    dim=64, depth=1, heads=2, mlp_dim=128, random_select=True, k=2)
    x = np.random.RandomState(0).rand(2, 4, 32, 32, 3).astype(np.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "patch": jax.random.PRNGKey(1)},
               x, train=False)
    y = m.apply(v, x, train=False)
    # 4x4 grid -> interior (valid_idx quirk) patches, 1 logit each
    from stdd_tpu.models.vit import interior_patch_indices
    n_int = interior_patch_indices(16).shape[0]
    assert y.shape == (2, n_int)
    # random_select at train uses k patches
    yt = m.apply(v, x, train=True, rngs={"patch": jax.random.PRNGKey(2)})
    assert yt.shape == (2, 2)


def test_st_transformer_shapes():
    m = build_model("st_transformer", image_size=32, patch_size=8, num_frames=4,
                    dim=48, depth=1, heads=2)
    x = np.random.RandomState(0).rand(2, 4, 32, 32, 3).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 1) and np.isfinite(np.asarray(y)).all()


def test_resnet2d_variants_and_freeze():
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    m = build_model("resnet2d", variant="resnet18")
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 2)   # reference fc hard-codes 2 outputs (:160)

    # freeze_backbone stops gradients everywhere except the fc
    def loss(params, freeze):
        out = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                      x, train=False, freeze_backbone=freeze)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"], True)
    conv_g = float(jnp.abs(g["conv1"]["kernel"]).sum())
    fc_g = float(jnp.abs(g["fc"]["kernel"]).sum())
    assert conv_g == 0.0 and fc_g > 0.0

    # a bottleneck/resnext variant builds with grouped width
    m50 = build_model("resnet2d", variant="resnext50_32x4d")
    v50 = jax.eval_shape(lambda: m50.init(jax.random.PRNGKey(0), x, train=False))
    assert "layer4_2" in v50["params"]


def test_multigrid_schedule():
    from stdd_tpu.train.multigrid import MultigridConfig, MultigridSchedule

    cfg = MultigridConfig()
    sched = MultigridSchedule(cfg)
    # shapes step from small-T/small-S toward the default and keep
    # B*T*S^2 approximately constant
    shapes = [s for _, s, _ in sched.schedule]
    assert shapes[-1][1:] == (cfg.default_t, cfg.default_s)
    default_size = cfg.default_t * cfg.default_s ** 2
    for b, t, s in shapes:
        assert abs(b * t * s * s - default_size) / default_size < 0.35
    # monotone epoch boundaries; max_epoch stretched by epoch_factor
    ends = [e for _, _, e in sched.schedule]
    assert ends == sorted(ends) and sched.max_epoch >= cfg.solver_max_epoch
    # update() flags shape changes exactly at boundaries
    shape0, ch0 = sched.update(0, None)
    assert ch0
    shape0b, ch0b = sched.update(1, shape0)
    _, chN = sched.update(ends[0], shape0)
    assert not ch0b or shape0b != shape0
    # LR boundaries: one value per cycle + doubled tail
    steps, lrs = sched.lr_boundaries()
    assert len(lrs) == len(sched.schedule) + 1 and len(steps) == len(sched.schedule) + 1
    # the boundaries wire straight into the step policy (same convention:
    # leading zero, len(lrs) == len(steps)) — first cycle gets lrs[0] and
    # the tail segment is indexable
    from stdd_tpu.train.lr_policy import steps_with_relative_lrs

    pol = steps_with_relative_lrs(1.0, steps, lrs, max_epoch=steps[-1] + 10)
    assert pol(0.0) == pytest.approx(lrs[0])
    assert pol(steps[-1] + 5) == pytest.approx(lrs[-1])
    # short cycle spatial pattern
    cfg2 = MultigridConfig(short_cycle=True)
    sched2 = MultigridSchedule(cfg2)
    s_long = 224
    sizes = [sched2.short_cycle_spatial(i, s_long) for i in range(3)]
    assert sizes == [112, 158, 224]
