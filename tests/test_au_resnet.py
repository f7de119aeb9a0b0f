"""LibreFace AU model parity: a torch ResNet-18 oracle (torchvision layout,
written here since torchvision isn't installed) vs the flax rebuild."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.models.au_resnet import (
    AU_KEYS,
    AUExtractor,
    AUResNet18,
    au_resnet_torch_to_flax,
    preprocess_faces,
)


def _torch_oracle(num_labels=12, dropout=0.1, seed=0):
    """Standard ResNet-18 + LibreFace head with torchvision state-dict naming."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            h = tnn.functional.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return tnn.functional.relu(h + idt)

    class Oracle(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            dims = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
            for li, (cin, cout, s) in enumerate(dims):
                setattr(self, f"layer{li+1}", tnn.Sequential(
                    BasicBlock(cin, cout, s), BasicBlock(cout, cout, 1)
                ))
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.classifier = tnn.Sequential(
                tnn.Linear(512, 128), tnn.ReLU(), tnn.BatchNorm1d(128),
                tnn.Dropout(dropout), tnn.Linear(128, num_labels), tnn.Sigmoid(),
            )

        def forward(self, x):
            x = tnn.functional.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            x = self.avgpool(x).flatten(1)
            return self.classifier(x)

    torch.manual_seed(seed)
    m = Oracle()
    # randomize BN stats so parity actually tests them
    g = torch.Generator().manual_seed(1)
    for mod in m.modules():
        if isinstance(mod, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            mod.running_mean.uniform_(-0.2, 0.2, generator=g)
            mod.running_var.uniform_(0.5, 1.5, generator=g)
    m.eval()
    return torch, m


def test_forward_parity_with_torch_oracle():
    torch, oracle = _torch_oracle()
    variables = au_resnet_torch_to_flax(oracle.state_dict())
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    model = AUResNet18()
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_preprocess_matches_torchvision_semantics():
    """Shorter-side 256 resize + center crop 224 + [0,1] + ImageNet norm."""
    rng = np.random.RandomState(0)
    face = rng.randint(0, 255, (1, 300, 260, 3), np.uint8)
    out = np.asarray(preprocess_faces(jnp.asarray(face)))
    assert out.shape == (1, 224, 224, 3)
    # constant-color image maps exactly
    c = np.full((1, 128, 180, 3), 128, np.uint8)
    out_c = np.asarray(preprocess_faces(jnp.asarray(c)))
    want = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out_c[0, 0, 0], want, rtol=1e-4)


def test_extractor_binary_dicts():
    ext = AUExtractor.random_init()
    faces = np.random.RandomState(0).randint(0, 255, (3, 180, 160, 3), np.uint8)
    dicts = ext(faces)
    assert len(dicts) == 3
    assert set(dicts[0]) == set(AU_KEYS)
    assert all(v in (0.0, 1.0) for d in dicts for v in d.values())
    acts = ext.activations(faces)
    assert acts.shape == (3, 12) and (acts >= 0).all() and (acts <= 1).all()
