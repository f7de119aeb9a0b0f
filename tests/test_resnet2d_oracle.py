"""Numeric torch-oracle parity for the legacy 2D ResNet bases
(_resnet_base.py — self-contained torchvision-style torch, no torchvision
needed)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.models.resnet2d import ResNet2D
from stdd_tpu.utils.torch_convert import resnet2d_torch_to_flax


def _build_ref(variant):
    import sys

    import torch

    from tests.oracles.ref_i3d import use_reference_root

    use_reference_root("/root/reference/altfreezing")
    from model.classifier import _resnet_base as rb

    torch.manual_seed(0)
    m = getattr(rb, variant)(pretrained=False)
    m.eval()
    return m


@pytest.mark.parametrize("variant", ["resnet18", "resnet50", "resnext50_32x4d"])
def test_resnet2d_matches_torch(variant):
    import torch

    ref = _build_ref(variant)
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x)).numpy()

    model = ResNet2D(variant=variant)
    out_j = np.asarray(model.apply(
        resnet2d_torch_to_flax(ref.state_dict()),
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=1e-3)
