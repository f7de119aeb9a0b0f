"""RetinaFace parity tests vs the reference torch implementation."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.models.retinaface import (
    CFG_MNET,
    RetinaFace,
    RetinaFaceDetector,
    decode_boxes,
    decode_landmarks,
    prior_boxes,
)
from stdd_tpu.utils.torch_convert import retinaface_torch_to_flax

REF = "/root/reference/altfreezing"


def _ref_module():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # torchvision isn't installed; stub the one helper the reference uses
    if "torchvision" not in sys.modules:
        import types
        from collections import OrderedDict

        import torch.nn as tnn

        class IntermediateLayerGetter(tnn.ModuleDict):
            def __init__(self, model, return_layers):
                rl = {str(k): str(v) for k, v in return_layers.items()}
                remaining = set(rl)
                layers = OrderedDict()
                for name, module in model.named_children():
                    layers[name] = module
                    remaining.discard(name)
                    if not remaining:
                        break  # torchvision truncates after the last return layer
                super().__init__(layers)
                self.return_layers = rl

            def forward(self, x):
                out = OrderedDict()
                for name, module in self.items():
                    x = module(x)
                    if name in self.return_layers:
                        out[self.return_layers[name]] = x
                return out

        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_utils = types.ModuleType("torchvision.models._utils")
        tv_utils.IntermediateLayerGetter = IntermediateLayerGetter
        tv.models = tv_models
        tv_models._utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models._utils"] = tv_utils

    from test_tools.ct.detection import alignment

    return torch, alignment


def test_priors_match_reference():
    torch, alignment = _ref_module()
    pb = alignment.PriorBox(dict(alignment.cfg_mnet), image_size=(96, 128))
    want = pb.forward().numpy()
    got = prior_boxes((96, 128))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_decode_matches_reference():
    torch, alignment = _ref_module()
    rng = np.random.RandomState(0)
    priors = prior_boxes((64, 64))
    loc = rng.randn(priors.shape[0], 4).astype(np.float32) * 0.3
    ldm = rng.randn(priors.shape[0], 10).astype(np.float32) * 0.3
    var = list(CFG_MNET["variance"])
    want_b = alignment.decode(torch.from_numpy(loc), torch.from_numpy(priors), var).numpy()
    want_l = alignment.decode_landm(torch.from_numpy(ldm), torch.from_numpy(priors), var).numpy()
    np.testing.assert_allclose(np.asarray(decode_boxes(loc, priors)), want_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(decode_landmarks(ldm, priors)), want_l, rtol=1e-5, atol=1e-6)


def test_forward_parity_with_reference():
    torch, alignment = _ref_module()
    torch.manual_seed(0)
    ref = alignment.RetinaFace(cfg=dict(alignment.cfg_mnet), phase="test")
    ref.eval()
    variables = retinaface_torch_to_flax(ref.state_dict())

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 96, 128).astype(np.float32) * 30
    with torch.no_grad():
        want_loc, want_conf, want_ldm = ref(torch.from_numpy(x))

    model = RetinaFace()
    got_loc, got_conf, got_ldm = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got_loc), want_loc.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_conf), want_conf.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_ldm), want_ldm.numpy(), rtol=1e-3, atol=1e-4)


def test_detector_end_to_end_shapes():
    det = RetinaFaceDetector.random_init(image_hw=(96, 128), top_k=16)
    frames = np.random.RandomState(0).randint(0, 255, (2, 96, 128, 3), np.uint8)
    dets, mask = det.detect(frames)
    assert dets.shape == (2, 16, 15)
    assert mask.shape == (2, 16)
