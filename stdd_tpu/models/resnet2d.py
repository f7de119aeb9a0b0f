"""Legacy 2D ResNet classifier bases.

Rebuild of ``model/classifier/_resnet_base.py`` (a torchvision-style 2D
ResNet: BasicBlock ``:42`` / Bottleneck ``:83`` / ResNet ``:126`` with the
``freeze_backbone`` detach in ``forward`` :203-:220, and the variant builders
resnet18/34/50/101/152, resnext50_32x4d/101_32x8d, wide_resnet50_2/101_2 at
``:240-:350``) plus ``ClassifierBase`` (``_classifier_base.py:8`` — a naming
shim over ModelBase). These are the 2D frame-level classifier bases the
plugin loader can resolve; the production pipeline uses the 3D I3D instead.

TPU-native: channels-last [B, H, W, C]; ``freeze_backbone`` is
``jax.lax.stop_gradient`` on the pooled feature (same semantics as torch's
``.detach()`` before the fc).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

VARIANTS = {
    # name: (block, layers, groups, width_per_group)
    "resnet18": ("basic", (2, 2, 2, 2), 1, 64),
    "resnet34": ("basic", (3, 4, 6, 3), 1, 64),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 1, 64),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 1, 64),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 32, 8),
    "wide_resnet50_2": ("bottleneck", (3, 4, 6, 3), 1, 128),
    "wide_resnet101_2": ("bottleneck", (3, 4, 23, 3), 1, 128),
}


class ConvBN2d(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    zero_init_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            scale_init=nn.initializers.zeros if self.zero_init_scale
            else nn.initializers.ones,
            dtype=jnp.float32,
        )(x)


class BasicBlock2d(nn.Module):
    """3×3 + 3×3 residual block (reference _resnet_base.py:42)."""

    features: int
    stride: int = 1
    zero_init_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(ConvBN2d(self.features, 3, self.stride, dtype=self.dtype,
                             name="conv1")(x, train))
        h = ConvBN2d(self.features, 3, zero_init_scale=self.zero_init_residual,
                     dtype=self.dtype, name="conv2")(h, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvBN2d(self.features, 1, self.stride, dtype=self.dtype,
                         name="downsample")(x, train)
        return nn.relu(x + h)


class Bottleneck2d(nn.Module):
    """1×1 / 3×3(groups) / 1×1 bottleneck (reference _resnet_base.py:83);
    width scales per torchvision: width = planes·(wpg/64)·groups."""

    planes: int
    stride: int = 1
    groups: int = 1
    width_per_group: int = 64
    zero_init_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.width_per_group / 64.0)) * self.groups
        out = self.planes * 4
        h = nn.relu(ConvBN2d(width, 1, dtype=self.dtype, name="conv1")(x, train))
        h = nn.relu(ConvBN2d(width, 3, self.stride, groups=self.groups,
                             dtype=self.dtype, name="conv2")(h, train))
        h = ConvBN2d(out, 1, zero_init_scale=self.zero_init_residual,
                     dtype=self.dtype, name="conv3")(h, train)
        if self.stride != 1 or x.shape[-1] != out:
            x = ConvBN2d(out, 1, self.stride, dtype=self.dtype,
                         name="downsample")(x, train)
        return nn.relu(x + h)


class ResNet2D(nn.Module):
    """Frame-level 2D ResNet classifier (reference ResNet,
    _resnet_base.py:126). Input [B, H, W, 3] → logits [B, num_classes];
    ``freeze_backbone=True`` stops gradients at the pooled feature
    (reference forward :218)."""

    variant: str = "resnet18"
    num_classes: int = 2              # reference hard-codes Linear(512*exp, 2) (:160)
    zero_init_residual: bool = False  # reference default (:128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, freeze_backbone: bool = False):
        block, layers, groups, wpg = VARIANTS[self.variant]
        x = x.astype(self.dtype)
        p = 3
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(p, p), (p, p)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name="bn1")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        for li, (n_blocks, planes) in enumerate(zip(layers, (64, 128, 256, 512))):
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                if block == "basic":
                    x = BasicBlock2d(planes, stride,
                                     zero_init_residual=self.zero_init_residual,
                                     dtype=self.dtype,
                                     name=f"layer{li + 1}_{bi}")(x, train)
                else:
                    x = Bottleneck2d(planes, stride, groups, wpg,
                                     zero_init_residual=self.zero_init_residual,
                                     dtype=self.dtype,
                                     name=f"layer{li + 1}_{bi}")(x, train)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if freeze_backbone:
            x = jax.lax.stop_gradient(x)
        return nn.Dense(self.num_classes, name="fc")(x)
