"""Numeric torch-oracle parity for the dual-pathway SlowFast network.

Builds the REFERENCE SlowFast (alpha=8, beta_inv=8, fusion 2/5 — the
shipped defaults) with random weights, converts the state dict
(slowfast_torch_to_flax) and checks logits agree — upgrading the SlowFast
row from shape tests to numbers. The reference takes the two pathway
tensors pre-split by its loader; ours slices the slow pathway internally.
"""

import numpy as np

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.models.slowfast import SlowFast
from stdd_tpu.utils.torch_convert import slowfast_torch_to_flax
from tests.oracles.ref_i3d import build_reference_slowfast


def test_slowfast_matches_torch():
    import torch

    T, S, alpha = 16, 64, 8
    ref = build_reference_slowfast(num_frames=T, crop_size=S, alpha=alpha)
    x = np.random.RandomState(0).randn(2, 3, T, S, S).astype(np.float32)
    slow = x[:, :, ::alpha]
    with torch.no_grad():
        out_t = ref([torch.from_numpy(slow), torch.from_numpy(x)]).numpy()

    variables = slowfast_torch_to_flax(ref.state_dict())
    model = SlowFast(cfg=I3DConfig(num_frames=T, crop_size=S), alpha=alpha)
    out_j = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False))
    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=1e-3)
