"""Numeric torch-oracle parity for the FTCN classifier.

Builds the REFERENCE FTCN plugin (I3D8x8 with ftcn_tt.yaml: temporal-only
conv mutation with stride->MaxPool substitution, stop_point=5 truncation,
TransformerHead depth 1 over 16 time tokens) with random weights, converts
its state dict (ftcn_torch_to_flax) and checks the logits match — upgrading
the FTCN row from structure tests to numbers. Production geometry (224,
T=32) is required: the reference head's pooling table hardcodes
spatial_size=14/time_size=16.
"""

import numpy as np

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.models.ftcn import FTCN
from stdd_tpu.utils.torch_convert import ftcn_torch_to_flax
from tests.oracles.ref_i3d import build_reference_ftcn


def test_ftcn_matches_torch():
    import torch

    ref = build_reference_ftcn()
    x = np.random.RandomState(0).randn(1, 3, 32, 224, 224).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))["final_output"].numpy()

    variables = ftcn_torch_to_flax(ref.state_dict())
    model = FTCN(cfg=I3DConfig(num_frames=32, crop_size=224,
                               temporal_only=True, stop_point=5))
    out_j = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False))
    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=1e-3)
