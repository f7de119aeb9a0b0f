"""RetinaFace (MobileNet-0.25) face detector — the reference's demo.py path.

Rebuild of ``test_tools/ct/detection/alignment.py``: MobileNetV1-0.25
backbone (``:119``), FPN (``:76``), 3×SSH context modules (``:45``),
class/bbox/landmark heads (``:156-196``), prior-box anchors (``:344``),
box/landmark decode (``:286/:299``) and NMS — the latter via the shared
fixed-shape device NMS (:mod:`stdd_tpu.ops.nms`).

Faithfulness notes:
- anchors: 2 per cell (min_sizes pairs per stride 8/16/32), variance
  (0.1, 0.2), no clipping (cfg_mnet, alignment.py:381).

Layout: NHWC on device; inputs are raw BGR minus (104, 117, 123) as in the
reference's ``batch_detect`` (alignment.py:535).
"""

from __future__ import annotations

import math
from itertools import product
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_fixed

CFG_MNET = {
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": (0.1, 0.2),
    "clip": False,
    "in_channel": 32,
    "out_channel": 64,
}

BGR_MEAN = np.array([104.0, 117.0, 123.0], np.float32)


class ConvBN(nn.Module):
    """3x3 conv → BN → optional LeakyReLU (alignment.py:12 conv_bn /
    :20 conv_bn_no_relu)."""

    features: int
    stride: int = 1
    kernel: int = 3
    leaky: Optional[float] = 0.0  # None = no relu
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding=[(pad, pad)] * 2, use_bias=False,
            feature_group_count=self.groups, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        if self.leaky is not None:
            x = jax.nn.leaky_relu(x, negative_slope=self.leaky)
        return x


class ConvDW(nn.Module):
    """Depthwise-separable block (alignment.py:34 conv_dw)."""

    features: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = ConvBN(c_in, stride=self.stride, leaky=0.1, groups=c_in, name="dw")(x, train)
        x = ConvBN(self.features, kernel=1, leaky=0.1, name="pw")(x, train)
        return x


class MobileNetV1Quarter(nn.Module):
    """MobileNetV1 ×0.25 backbone returning stage1/2/3 features."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(8, stride=2, leaky=0.1, name="s1_conv")(x, train)
        for i, (f, s) in enumerate([(16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]):
            x = ConvDW(f, s, name=f"s1_dw{i}")(x, train)
        f1 = x
        for i, s in enumerate([2, 1, 1, 1, 1, 1]):
            x = ConvDW(128, s, name=f"s2_dw{i}")(x, train)
        f2 = x
        for i, s in enumerate([2, 1]):
            x = ConvDW(256, s, name=f"s3_dw{i}")(x, train)
        return f1, f2, x


class SSH(nn.Module):
    """Single-stage headless context module (alignment.py:45)."""

    out_channel: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        leaky = 0.1 if self.out_channel <= 64 else 0.0
        c3 = ConvBN(self.out_channel // 2, leaky=None, name="conv3x3")(x, train)
        c5_1 = ConvBN(self.out_channel // 4, leaky=leaky, name="conv5x5_1")(x, train)
        c5 = ConvBN(self.out_channel // 4, leaky=None, name="conv5x5_2")(c5_1, train)
        c7_2 = ConvBN(self.out_channel // 4, leaky=leaky, name="conv7x7_2")(c5_1, train)
        c7 = ConvBN(self.out_channel // 4, leaky=None, name="conv7x7_3")(c7_2, train)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, feats, train: bool = False):
        leaky = 0.1 if self.out_channels <= 64 else 0.0
        o1 = ConvBN(self.out_channels, kernel=1, leaky=leaky, name="output1")(feats[0], train)
        o2 = ConvBN(self.out_channels, kernel=1, leaky=leaky, name="output2")(feats[1], train)
        o3 = ConvBN(self.out_channels, kernel=1, leaky=leaky, name="output3")(feats[2], train)
        up3 = jax.image.resize(o3, o2.shape[:1] + o2.shape[1:3] + o3.shape[3:], "nearest")
        o2 = ConvBN(self.out_channels, leaky=leaky, name="merge2")(o2 + up3, train)
        up2 = jax.image.resize(o2, o1.shape[:1] + o1.shape[1:3] + o2.shape[3:], "nearest")
        o1 = ConvBN(self.out_channels, leaky=leaky, name="merge1")(o1 + up2, train)
        return [o1, o2, o3]


class RetinaFace(nn.Module):
    """Backbone → FPN → SSH → per-level heads; output
    (bbox [B,N,4], scores [B,N,2] softmaxed, landmarks [B,N,10])."""

    out_channel: int = 64
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MobileNetV1Quarter(name="body")(x, train)
        fpn = FPN(self.out_channel, name="fpn")(list(feats), train)
        features = [
            SSH(self.out_channel, name=f"ssh{i+1}")(f, train) for i, f in enumerate(fpn)
        ]
        bbox, cls, ldm = [], [], []
        for i, f in enumerate(features):
            B = f.shape[0]
            b = nn.Conv(self.num_anchors * 4, (1, 1), name=f"bbox_head{i}")(f)
            c = nn.Conv(self.num_anchors * 2, (1, 1), name=f"class_head{i}")(f)
            l = nn.Conv(self.num_anchors * 10, (1, 1), name=f"ldm_head{i}")(f)
            bbox.append(b.reshape(B, -1, 4))
            cls.append(c.reshape(B, -1, 2))
            ldm.append(l.reshape(B, -1, 10))
        bbox = jnp.concatenate(bbox, axis=1)
        cls = jax.nn.softmax(jnp.concatenate(cls, axis=1), axis=-1)
        ldm = jnp.concatenate(ldm, axis=1)
        return bbox, cls, ldm


def prior_boxes(image_hw: Tuple[int, int], cfg: Dict = CFG_MNET) -> np.ndarray:
    """Anchor centers/sizes normalized to [0,1] (alignment.py:344 PriorBox)."""
    h, w = image_hw
    anchors: List[float] = []
    for k, step in enumerate(cfg["steps"]):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i, j in product(range(fh), range(fw)):
            for min_size in cfg["min_sizes"][k]:
                s_kx = min_size / w
                s_ky = min_size / h
                cx = (j + 0.5) * step / w
                cy = (i + 0.5) * step / h
                anchors += [cx, cy, s_kx, s_ky]
    out = np.asarray(anchors, np.float32).reshape(-1, 4)
    if cfg["clip"]:
        out = np.clip(out, 0, 1)
    return out


def decode_boxes(loc, priors, variances=CFG_MNET["variance"]):
    """(alignment.py:286 decode) → (x1, y1, x2, y2) normalized."""
    centers = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    sizes = priors[:, 2:] * jnp.exp(loc[:, 2:] * variances[1])
    tl = centers - sizes / 2
    return jnp.concatenate([tl, tl + sizes], axis=1)


def decode_landmarks(pre, priors, variances=CFG_MNET["variance"]):
    """(alignment.py:299 decode_landm) → 5 points, normalized."""
    out = [
        priors[:, :2] + pre[:, 2 * i : 2 * i + 2] * variances[0] * priors[:, 2:]
        for i in range(5)
    ]
    return jnp.concatenate(out, axis=1)


class RetinaFaceDetector:
    """Batched detector with the reference's postprocess
    (batch_detect at alignment.py:535: confidence filter 0.02 → top 5000 →
    NMS 0.4 → top 750)."""

    def __init__(
        self,
        variables,
        image_hw: Tuple[int, int],
        conf_threshold: float = 0.02,
        nms_threshold: float = 0.4,
        top_k: int = 750,
    ):
        self.model = RetinaFace()
        self.variables = variables
        self.image_hw = image_hw
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold
        self.top_k = top_k
        self.priors = jnp.asarray(prior_boxes(image_hw))
        self._detect = jax.jit(self._detect_impl)

    @classmethod
    def random_init(cls, image_hw=(240, 320), seed=0, **kw):
        model = RetinaFace()
        v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1,) + image_hw + (3,)))
        return cls(v, image_hw, **kw)

    def _detect_impl(self, frames_bgr):
        h, w = self.image_hw
        x = frames_bgr.astype(jnp.float32) - BGR_MEAN
        loc, conf, ldm = self.model.apply(self.variables, x)
        scale_b = jnp.asarray([w, h, w, h], jnp.float32)
        scale_l = jnp.tile(jnp.asarray([w, h], jnp.float32), 5)

        def one(loc_i, conf_i, ldm_i):
            boxes = decode_boxes(loc_i, self.priors) * scale_b
            lms = decode_landmarks(ldm_i, self.priors) * scale_l
            scores = conf_i[:, 1]
            xywh = jnp.stack(
                [boxes[:, 0], boxes[:, 1], boxes[:, 2] - boxes[:, 0],
                 boxes[:, 3] - boxes[:, 1]], axis=1,
            )
            keep, mask = nms_fixed(
                xywh, scores, self.nms_threshold, self.conf_threshold,
                self.top_k, plus1=True,   # py_cpu_nms pixel convention
            )
            det = jnp.concatenate(
                [boxes[keep], scores[keep, None], lms[keep]], axis=1
            )  # [top_k, 15]: x1,y1,x2,y2,score,10 lmk
            return jnp.where(mask[:, None], det, 0.0), mask

        return jax.vmap(one)(loc, conf, ldm)

    def detect(self, frames_bgr) -> Tuple[jnp.ndarray, jnp.ndarray]:
        frames_bgr = jnp.asarray(frames_bgr)
        if frames_bgr.ndim == 3:
            frames_bgr = frames_bgr[None]
        return self._detect(frames_bgr)
