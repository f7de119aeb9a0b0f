"""68-point facial-landmark CNN (MobileNetV2-GDConv, the reference demo
path's landmark model — ``test_tools/ct/face_alignment/basenet.py:58``).

MobileNetV2 trunk (torchvision layout) → GDConv head: a 7×7 linear depthwise
conv collapsing the spatial map, then a 1×1 conv to 136 = 68·(x, y) outputs
normalized to the crop. Feed preparation follows the reference
(``predictor.py:41`` prepare_feed): 1.2× square crop around the box,
zero-padded at frame borders, resized to 224², ImageNet-normalized;
``reproject`` (:29) maps normalized landmarks back to frame coordinates.

The reference's weights are downloaded at runtime (not in-repo); the
torchvision-layout converter loads them when available.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision MobileNetV2 inverted-residual settings: (expand, out, n, stride)
_IR_SETTINGS = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu6: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=self.stride,
                    padding=[(pad, pad)] * 2, feature_group_count=self.groups,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        if self.relu6:
            x = jnp.minimum(jnp.maximum(x, 0.0), 6.0)
        return x


class _InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        hidden = c_in * self.expand
        h = x
        if self.expand != 1:
            h = _ConvBNReLU(hidden, kernel=1, name="expand")(h, train)
        h = _ConvBNReLU(hidden, kernel=3, stride=self.stride, groups=hidden,
                        name="depthwise")(h, train)
        h = _ConvBNReLU(self.features, kernel=1, relu6=False, name="project")(h, train)
        if self.stride == 1 and c_in == self.features:
            return x + h
        return h


class MobileNetV2Trunk(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBNReLU(32, stride=2, name="stem")(x, train)
        bi = 0
        for expand, out, n, stride in _IR_SETTINGS:
            for i in range(n):
                x = _InvertedResidual(out, stride if i == 0 else 1, expand,
                                      name=f"block{bi}")(x, train)
                bi += 1
        x = _ConvBNReLU(1280, kernel=1, name="head_conv")(x, train)
        return x


class MobileNetGDConv(nn.Module):
    """Trunk → 7×7 linear depthwise GDConv → 1×1 → [B, 136]."""

    num_outputs: int = 136

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MobileNetV2Trunk(name="base")(x, train)           # [B, 7, 7, 1280]
        x = nn.Conv(1280, (7, 7), padding="VALID", feature_group_count=1280,
                    use_bias=False, name="gdconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="gdconv_bn")(x)
        x = nn.Conv(self.num_outputs, (1, 1), use_bias=False, name="out_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="out_bn")(x)
        return x.reshape(x.shape[0], -1)


IMAGENET_MEAN01 = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD01 = np.array([0.229, 0.224, 0.225], np.float32)


def prepare_feed(img_rgb: np.ndarray, box) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """1.2× square crop (zero-padded at borders) → 224² ImageNet-normalized
    tensor; returns (feed [224,224,3] float32, crop box) — predictor.py:41."""
    import cv2

    height, width = img_rgb.shape[:2]
    x1, y1, x2, y2 = [int(v) for v in box[:4]]
    w = x2 - x1 + 1
    h = y2 - y1 + 1
    size = int(min(w, h) * 1.2)
    cx = x1 + w // 2
    cy = y1 + h // 2
    x1 = cx - size // 2
    x2 = x1 + size
    y1 = cy - size // 2
    y2 = y1 + size
    dx, dy = max(0, -x1), max(0, -y1)
    x1c, y1c = max(0, x1), max(0, y1)
    edx, edy = max(0, x2 - width), max(0, y2 - height)
    x2c, y2c = min(width, x2), min(height, y2)
    crop = img_rgb[y1c:y2c, x1c:x2c]
    if dx > 0 or dy > 0 or edx > 0 or edy > 0:
        crop = cv2.copyMakeBorder(crop, dy, edy, dx, edx, cv2.BORDER_CONSTANT, value=0)
    feed = cv2.resize(crop, (224, 224)).astype(np.float32) / 255.0
    feed = (feed - IMAGENET_MEAN01) / IMAGENET_STD01
    # the reference reprojects with the border-CLAMPED box (predictor.py:68
    # new_bbox), not the pre-clamp square — they differ whenever the 1.2x
    # crop extends past the frame
    return feed, (x1c, y1c, x2c, y2c)


def reproject(crop_box, landmarks_norm: np.ndarray) -> np.ndarray:
    """Normalized [68, 2] landmarks → frame coordinates (predictor.py:29)."""
    x1, y1, x2, y2 = crop_box
    out = np.asarray(landmarks_norm, np.float32).copy()
    out[:, 0] = out[:, 0] * (x2 - x1) + x1
    out[:, 1] = out[:, 1] * (y2 - y1) + y1
    return out


class LandmarkPredictor:
    """Batched 68-pt predictor (predictor.py:113 batch_predict2)."""

    def __init__(self, variables=None, seed: int = 0):
        self.model = MobileNetGDConv()
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 224, 224, 3))
            )
        self.variables = variables
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    @classmethod
    def from_torch_checkpoint(cls, path: str):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return cls(gdconv_torch_to_flax(sd))

    def predict(self, img_rgb: np.ndarray, boxes) -> List[np.ndarray]:
        feeds, crop_boxes = [], []
        for b in boxes:
            f, cb = prepare_feed(img_rgb, b)
            feeds.append(f)
            crop_boxes.append(cb)
        if not feeds:
            return []
        out = np.asarray(self._fwd(self.variables, jnp.asarray(np.stack(feeds))))
        return [
            reproject(cb, o.reshape(68, 2)) for cb, o in zip(crop_boxes, out)
        ]


def gdconv_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference MobileNet_GDConv state dict → flax variables. The torch
    module wraps torchvision mobilenet_v2 features as ``base_net.0.*`` and
    adds ``linear7``/``linear1`` ConvBlocks."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    sd = {k.replace("module.", ""): arr(v) for k, v in state_dict.items()}

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

    f = "base_net.0.features" if any(k.startswith("base_net.0.features") for k in sd) \
        else "pretrain_net.features"
    conv("base/stem/conv", f + ".0.0")
    bn("base/stem/bn", f + ".0.1")
    bi = 0
    for ti in range(1, 18):  # features.1..17 are inverted residuals
        base = f + f".{ti}.conv"
        dst = f"base/block{bi}"
        if f"{base}.3.weight" in sd:  # expand variant: 0(expand) 1(dw) 2(conv) 3(bn)
            conv(f"{dst}/expand/conv", base + ".0.0")
            bn(f"{dst}/expand/bn", base + ".0.1")
            conv(f"{dst}/depthwise/conv", base + ".1.0")
            bn(f"{dst}/depthwise/bn", base + ".1.1")
            conv(f"{dst}/project/conv", base + ".2")
            bn(f"{dst}/project/bn", base + ".3")
        else:  # first block, no expansion: 0(dw) 1(conv) 2(bn)
            conv(f"{dst}/depthwise/conv", base + ".0.0")
            bn(f"{dst}/depthwise/bn", base + ".0.1")
            conv(f"{dst}/project/conv", base + ".1")
            bn(f"{dst}/project/bn", base + ".2")
        bi += 1
    conv("base/head_conv/conv", f + ".18.0")
    bn("base/head_conv/bn", f + ".18.1")
    conv("gdconv", "linear7.conv")
    bn("gdconv_bn", "linear7.bn")
    conv("out_conv", "linear1.conv")
    bn("out_bn", "linear1.bn")
    return {"params": params, "batch_stats": stats}
