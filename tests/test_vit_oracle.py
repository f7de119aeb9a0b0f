"""Numeric torch-oracle parity for the ViT extras (VideoiT and the
factorized SpatialTemporal_Transformer).

VideoiT's eval path shuffles its interior-patch order (the reference's
RandomSelect draws random.sample(candidates, max_k) even in eval), so the
per-patch logit VECTORS are compared sorted — each patch's time-series is
classified independently, so sorting is order-invariant and exact. The
reference ST-transformer's patch Linear is commented out (3·p² must equal
dim); the converter injects an identity projection for our explicit Dense.
"""

import numpy as np

import jax.numpy as jnp

from stdd_tpu.models.vit import SpatialTemporalTransformer, VideoiT
from stdd_tpu.utils.torch_convert import (
    st_transformer_torch_to_flax,
    videoit_torch_to_flax,
)
from tests.oracles.ref_i3d import (
    REFERENCE_ROOT,
    _install_fvcore_stub,
    use_reference_root,
)


def _import_reference_tt():
    import sys
    import types

    _install_fvcore_stub()
    import torch

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        tl.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = tm
        tm.layers = tl
        sys.modules.update(
            {"timm": timm, "timm.models": tm, "timm.models.layers": tl})
    use_reference_root(REFERENCE_ROOT)
    import model.classifier.time_transformer as tt

    return tt


def test_videoit_matches_torch():
    import torch

    tt = _import_reference_tt()
    T, S, p, dim = 8, 56, 8, 64
    torch.manual_seed(0)
    ref = tt.VideoiT(image_size=S, patch_size=p, num_patches=T,
                     num_classes=1, dim=dim, depth=2, heads=4, mlp_dim=128)
    ref.eval()
    x = np.random.RandomState(0).randn(2, 3, T, S, S).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x)).numpy()

    model = VideoiT(image_size=S, patch_size=p, num_frames=T, num_classes=1,
                    dim=dim, depth=2, heads=4, dim_head=64, mlp_dim=128)
    out_j = np.asarray(model.apply(
        videoit_torch_to_flax(ref.state_dict()),
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(
        np.sort(out_j, axis=1), np.sort(out_t, axis=1), atol=5e-5, rtol=1e-4)


def test_st_transformer_matches_torch():
    import torch

    tt = _import_reference_tt()
    T, S, p = 4, 64, 8          # 3*8*8 = 192 = dim (the reference's implicit
    torch.manual_seed(0)        # requirement with its Linear commented out)
    ref = tt.SpatialTemporal_Transformer(
        image_size=S, patch_size=p, num_classes=1, num_frames=T,
        dim=192, depth=2, heads=3)
    ref.eval()
    x = np.random.RandomState(1).randn(2, T, 3, S, S).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x)).numpy()

    model = SpatialTemporalTransformer(
        image_size=S, patch_size=p, num_frames=T, num_classes=1,
        dim=192, depth=2, heads=3)
    out_j = np.asarray(model.apply(
        st_transformer_torch_to_flax(ref.state_dict()),
        jnp.asarray(x.transpose(0, 1, 3, 4, 2)), train=False))
    np.testing.assert_allclose(out_j, out_t, atol=5e-5, rtol=1e-4)


def test_gated_moe_matches_torch():
    """GatedMoE late-fusion gate vs the reference module (engine_rgb.py:369),
    including the asymmetric temperature clamps (t_rgb>=1, t_dual>=0.1)."""
    import sys
    import types

    import torch

    if "tqdm" not in sys.modules:
        try:
            import tqdm  # noqa: F401
        except ImportError:
            stub = types.ModuleType("tqdm")
            stub.tqdm = lambda x, **k: x
            sys.modules["tqdm"] = stub
    from tests.oracles.ref_i3d import use_reference_root as _use

    _use("/root/reference/dualrun")
    from rgb.engine_rgb import GatedMoE as RefGatedMoE

    from stdd_tpu.models.dual_rgb import GatedMoE

    torch.manual_seed(0)
    ref = RefGatedMoE(hidden=8)
    with torch.no_grad():
        ref.t_rgb.fill_(0.7)      # below its clamp floor of 1.0
        ref.t_dual.fill_(2.3)
    ref.eval()
    z_rgb = np.random.RandomState(0).randn(16, 1).astype(np.float32) * 3
    z_dual = np.random.RandomState(1).randn(16, 1).astype(np.float32) * 3
    with torch.no_grad():
        z_t, g_t = ref(torch.from_numpy(z_rgb), torch.from_numpy(z_dual))

    sd = ref.state_dict()
    params = {
        "t_rgb": np.float32(sd["t_rgb"].item()),
        "t_dual": np.float32(sd["t_dual"].item()),
        "gate_fc1": {"kernel": sd["gate.0.weight"].numpy().T,
                     "bias": sd["gate.0.bias"].numpy()},
        "gate_fc2": {"kernel": sd["gate.2.weight"].numpy().T,
                     "bias": sd["gate.2.bias"].numpy()},
    }
    z_j, g_j = GatedMoE(hidden=8).apply(
        {"params": params}, jnp.asarray(z_rgb), jnp.asarray(z_dual))
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_j), g_t.numpy(), atol=1e-6)
