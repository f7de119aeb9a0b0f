"""Per-variant ResUNet coverage: each of the 7 reference variants
(video_model_builder.py:1128-2742) builds, runs forward at its documented
shapes, and carries the variant's decoder widths / head stack / class head
(RESUNET_VARIANTS switch table)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.models import MODEL_REGISTRY, build_model
from stdd_tpu.models.unet3d import (
    RESUNET_VARIANTS, ResUNet3D, make_resunet,
)

# tiny-but-faithful config: w=64 keeps the reference channel widths, tiny
# spatial/temporal extent keeps it CPU-fast
CFG = I3DConfig(num_frames=2, crop_size=32, depth=50)
X = np.random.RandomState(0).rand(1, 2, 32, 32, 3).astype(np.float32)


@pytest.mark.parametrize("name", sorted(RESUNET_VARIANTS))
def test_variant_forward_shapes(name):
    var = RESUNET_VARIANTS[name]
    m = make_resunet(name, cfg=CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(X), train=False)
    masks, out = m.apply(v, jnp.asarray(X), train=False)
    n = len(var.labels)
    assert masks.shape == (1, 2, 8, 8, n)
    m_np = np.asarray(masks)
    assert np.isfinite(m_np).all() and (m_np >= 0).all() and (m_np <= 1).all()
    if var.class_per_label:
        assert out.shape == (1, n, 2 * var.class_features)
    else:
        assert out.shape == (1, 2 * n * var.class_features)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    if var.class_sigmoid:
        assert (o >= 0).all() and (o <= 1).all()

    # decoder widths follow the variant table (t4/t3 conv out-channels)
    p = v["params"]
    lbl = var.labels[0]
    t4 = p[f"t4_{lbl}"]["conv1"]
    kern = t4["branch2"]["c"]["conv"]["kernel"] if var.decoder == "res" \
        else t4["Conv_0"]["kernel"]
    assert kern.shape[-1] == var.t4_features, (name, kern.shape)
    head = p[f"conv1x1_{lbl}"]
    if var.head_hidden:
        assert head["conv1"]["kernel"].shape[-1] == var.head_hidden
        assert head["conv2"]["kernel"].shape[-1] == 1
    else:
        assert head["conv1"]["kernel"].shape[-1] == 1
    assert p["linear"]["kernel"].shape == (1, var.class_features)


def test_all_variants_registered():
    for name in RESUNET_VARIANTS:
        reg = "resunet" if name == "resunet" else f"resunet_{name}"
        assert reg in MODEL_REGISTRY, reg
    m = build_model("resunet_strong", cfg=CFG)
    assert isinstance(m, ResUNet3D)


def test_freeze_backbone_stops_encoder_grads():
    """freeze_backbone=True must zero encoder gradients while decoder
    branches still learn (reference get_detach_var, :1546-1551)."""
    m = make_resunet("light", cfg=CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(X), train=False)

    def loss(params, freeze):
        masks, out = m.apply(
            {**v, "params": params}, jnp.asarray(X), train=False,
            freeze_backbone=freeze)
        return jnp.sum(out)

    g_frozen = jax.grad(loss)(v["params"], True)
    g_free = jax.grad(loss)(v["params"], False)

    def total(tree):
        return float(sum(jnp.abs(g).sum() for g in jax.tree_util.tree_leaves(tree)))

    assert total(g_frozen["s4"]) == 0.0
    assert total(g_free["s4"]) > 0.0
    assert total(g_frozen["t4_rotate"]) > 0.0


def test_variant_label_override():
    """Common-family labels come from config (cfg.RESNET.LABELS) — the
    ``labels`` field overrides the preset."""
    m = make_resunet("common", cfg=CFG, labels=("a", "b"))
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(X), train=False)
    masks, out = m.apply(v, jnp.asarray(X), train=False)
    assert masks.shape[-1] == 2
    assert out.shape == (1, 2, 2 * 2)   # (B, n_labels, T*class_features)
