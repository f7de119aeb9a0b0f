"""Numeric torch-oracle parity for ResUNet variants.

Instantiates the REFERENCE ResUNet classes (video_model_builder.py:1812
ResUNetContinus / :2046 ResUNetCommon) with random weights, converts their
state dicts (utils.torch_convert.resunet_torch_to_flax) and checks masks AND
verdict outputs match — upgrading the per-variant claim from shape tests to
numbers. Continus covers the single-fused-label + Linear(1,1)+sigmoid head;
Common covers cfg labels, input detach, Linear(1,2) logits and the
label-major per-label reshape.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.models.unet3d import make_resunet
from stdd_tpu.utils.torch_convert import resunet_torch_to_flax
from tests.oracles.ref_i3d import build_reference_resunet

CASES = [
    ("ResUNet", "resunet", ("rotate", "light")),
    ("ResUNetLight", "light", ("rotate", "light")),
    ("ResUNetContinus", "continus", ("all",)),
    ("ResUNetCommon", "common", ("rotate", "light", "skip")),
    ("ResUNetCommon2", "common2", ("rotate", "light", "skip")),
    ("ResUNetLightFix", "lightfix", ("rotate", "light", "skip")),
    ("ResUNetStrong", "strong", ("rotate", "light", "skip")),
]


@pytest.mark.parametrize("ref_cls,name,labels", CASES)
def test_resunet_variant_matches_torch(ref_cls, name, labels):
    import torch

    ref = build_reference_resunet(ref_cls, num_frames=4, crop_size=32,
                                  labels=labels)
    x = np.random.RandomState(0).randn(2, 3, 4, 32, 32).astype(np.float32)
    with torch.no_grad():
        masks_t, out_t = ref([torch.from_numpy(x)])

    variables = resunet_torch_to_flax(ref.state_dict())
    model = make_resunet(name, cfg=I3DConfig(num_frames=4, crop_size=32))
    masks_j, out_j = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False
    )

    # ours [B,T,H,W,L] vs torch [B,L,T,H,W]
    np.testing.assert_allclose(
        np.asarray(masks_j).transpose(0, 4, 1, 2, 3), masks_t.numpy(),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), atol=2e-4, rtol=1e-3,
    )
