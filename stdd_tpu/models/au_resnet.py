"""LibreFace Action-Unit extractor: ResNet-18 encoder + sigmoid MLP head.

Rebuild of the reference AU model
(``preprocessing/libreface/AU_Detection/models/resnet18.py:6``: torchvision
resnet18 encoder → Linear(512,128) → ReLU → BatchNorm1d → Dropout →
Linear(128,12) → Sigmoid) and its inference adapter
(``libreface_adapter.py:67``: Resize(256) shorter-side → CenterCrop(224) →
ImageNet normalize; activations thresholded at 0.5 into a binary AU dict,
``solver_inference_image.py:117`` image_inference_batch).

The converter consumes torchvision-convention state dicts (conv1, bn1,
layer{1..4}.{0,1}.conv1/bn1/conv2/bn2/downsample, classifier.*) so real
LibreFace checkpoints load directly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

AU_KEYS = ["AU01", "AU02", "AU04", "AU06", "AU07", "AU10",
           "AU12", "AU14", "AU15", "AU17", "AU23", "AU24"]

IMAGENET_MEAN01 = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD01 = np.array([0.229, 0.224, 0.225], np.float32)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(h)
        if identity.shape[-1] != self.features or self.stride != 1:
            identity = nn.Conv(self.features, (1, 1), strides=self.stride,
                               use_bias=False, name="down_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="down_bn")(identity)
        return nn.relu(h + identity)


class ResNet18Encoder(nn.Module):
    """Standard ResNet-18 trunk → [B, 512] pooled features (NHWC)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for li, (f, s) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for bi in range(2):
                x = BasicBlock(f, s if bi == 0 else 1, name=f"layer{li+1}_{bi}")(x, train)
        return jnp.mean(x, axis=(1, 2))


class AUResNet18(nn.Module):
    """Encoder + the LibreFace AU head → 12 sigmoid activations."""

    num_labels: int = 12
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = ResNet18Encoder(name="encoder")(x, train)
        h = nn.Dense(128, name="fc1")(feats)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = jax.nn.sigmoid(nn.Dense(self.num_labels, name="fc2")(h))
        if return_features:
            return out, feats
        return out


def preprocess_faces(faces_rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Batched LibreFace transform: shorter-side resize to 256 (bilinear,
    antialiased), center-crop 224, scale to [0,1], ImageNet normalize."""
    B, H, W, C = faces_rgb_u8.shape
    if H <= W:
        nh, nw = 256, max(1, int(round(W * 256 / H)))
    else:
        nh, nw = max(1, int(round(H * 256 / W))), 256
    x = jax.image.resize(
        faces_rgb_u8.astype(jnp.float32), (B, nh, nw, C), method="linear",
        antialias=True,
    )
    top = (nh - 224) // 2
    left = (nw - 224) // 2
    x = x[:, top : top + 224, left : left + 224, :]
    x = x / 255.0
    return (x - IMAGENET_MEAN01) / IMAGENET_STD01


class AUExtractor:
    """Batched AU inference service (the ``get_au_from_face_ndarray`` adapter,
    libreface_adapter.py:84): faces in, binary AU dicts out."""

    def __init__(self, variables, threshold: float = 0.5):
        self.model = AUResNet18()
        self.variables = variables
        self.threshold = threshold
        self._infer = jax.jit(
            lambda v, x: self.model.apply(v, preprocess_faces(x), train=False)
        )

    @classmethod
    def random_init(cls, seed: int = 0, **kw):
        model = AUResNet18()
        v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 224, 224, 3)))
        return cls(v, **kw)

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return cls(au_resnet_torch_to_flax(sd), **kw)

    def activations(self, faces_rgb_u8: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] uint8 RGB faces → [B, 12] sigmoid activations."""
        return np.asarray(self._infer(self.variables, jnp.asarray(faces_rgb_u8)))

    def __call__(self, faces_rgb_u8) -> List[Dict[str, float]]:
        acts = self.activations(np.asarray(faces_rgb_u8))
        binary = (acts >= self.threshold).astype(float)
        return [dict(zip(AU_KEYS, row)) for row in binary]


def au_resnet_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision-convention LibreFace state dict → flax variables.

    Reference encoder = nn.Sequential of resnet18 children: 0=conv1 1=bn1
    4..7=layer1..4; classifier = Sequential(0 Linear,2 BatchNorm1d,4 Linear).
    Plain torchvision names (conv1, layer1.0...) are accepted too.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        # Sequential-wrapped encoder indices → torchvision names
        k = (k.replace("encoder.0.", "conv1.").replace("encoder.1.", "bn1.")
             .replace("encoder.4.", "layer1.").replace("encoder.5.", "layer2.")
             .replace("encoder.6.", "layer3.").replace("encoder.7.", "layer4."))
        sd[k] = arr(v)

    def put(tree, path, v):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def conv(dst, src):
        put(params, dst + "/kernel", sd[src + ".weight"].transpose(2, 3, 1, 0))

    def bn(dst, src):
        put(params, dst + "/scale", sd[src + ".weight"])
        put(params, dst + "/bias", sd[src + ".bias"])
        put(stats, dst + "/mean", sd[src + ".running_mean"])
        put(stats, dst + "/var", sd[src + ".running_var"])

    def dense(dst, src):
        put(params, dst + "/kernel", sd[src + ".weight"].T)
        put(params, dst + "/bias", sd[src + ".bias"])

    conv("encoder/conv1", "conv1")
    bn("encoder/bn1", "bn1")
    for li in range(1, 5):
        for bi in range(2):
            base = f"layer{li}.{bi}"
            dst = f"encoder/layer{li}_{bi}"
            conv(f"{dst}/conv1", f"{base}.conv1")
            bn(f"{dst}/bn1", f"{base}.bn1")
            conv(f"{dst}/conv2", f"{base}.conv2")
            bn(f"{dst}/bn2", f"{base}.bn2")
            if f"{base}.downsample.0.weight" in sd:
                conv(f"{dst}/down_conv", f"{base}.downsample.0")
                bn(f"{dst}/down_bn", f"{base}.downsample.1")
    dense("fc1", "classifier.0")
    bn("bn", "classifier.2")
    dense("fc2", "classifier.4")
    return {"params": params, "batch_stats": stats}
