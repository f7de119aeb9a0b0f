"""Load the REFERENCE torch I3D as a numerical oracle for parity tests.

This module imports the reference implementation from /root/reference
(read-only, used strictly as a test fixture — none of its code is copied into
stdd_tpu). The reference depends on ``fvcore``, which is not installed, so we
install a minimal stub into ``sys.modules`` first: a string registry and a
Kaiming-fill — just enough for ``slowfast.models`` to import.
"""

from __future__ import annotations

import math
import sys
import types

REFERENCE_ROOT = "/root/reference/altfreezing"


def _install_fvcore_stub():
    if "fvcore" in sys.modules:
        return
    import torch.nn as nn

    fvcore = types.ModuleType("fvcore")
    common = types.ModuleType("fvcore.common")
    registry_mod = types.ModuleType("fvcore.common.registry")
    config_mod = types.ModuleType("fvcore.common.config")
    nn_mod = types.ModuleType("fvcore.nn")
    weight_init_mod = types.ModuleType("fvcore.nn.weight_init")

    class Registry:
        def __init__(self, name):
            self._name = name
            self._map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(o):
                    self._map[o.__name__] = o
                    return o
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    class CfgNode(dict):
        """Tiny attribute-dict standing in for fvcore's CfgNode."""

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

        def merge_from_str(self, s):
            import yaml

            def rec(dst, src):
                for k, v in (src or {}).items():
                    if isinstance(v, dict):
                        node = dst.setdefault(k, CfgNode())
                        rec(node, v)
                    else:
                        dst[k] = v

            rec(self, yaml.safe_load(s))

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0.0)

    file_io_mod = types.ModuleType("fvcore.common.file_io")

    class PathManager:
        @staticmethod
        def open(path, mode="r", **kw):
            return open(path, mode, **kw)

        @staticmethod
        def exists(path):
            import os
            return os.path.exists(path)

        @staticmethod
        def mkdirs(path):
            import os
            os.makedirs(path, exist_ok=True)

        @staticmethod
        def ls(path):
            import os
            return os.listdir(path)

        @staticmethod
        def rm(path):
            import os
            os.remove(path)

    file_io_mod.PathManager = PathManager

    registry_mod.Registry = Registry
    config_mod.CfgNode = CfgNode
    weight_init_mod.c2_msra_fill = c2_msra_fill
    fvcore.common = common
    fvcore.nn = nn_mod
    common.registry = registry_mod
    common.config = config_mod
    nn_mod.weight_init = weight_init_mod
    for name, mod in [
        ("fvcore", fvcore),
        ("fvcore.common", common),
        ("fvcore.common.registry", registry_mod),
        ("fvcore.common.config", config_mod),
        ("fvcore.nn", nn_mod),
        ("fvcore.nn.weight_init", weight_init_mod),
        ("fvcore.common.file_io", file_io_mod),
    ]:
        sys.modules[name] = mod


def _make_cfg(num_frames=32, crop_size=224, num_classes=1):
    from fvcore.common.config import CfgNode

    c = CfgNode()
    c.DETECTION = CfgNode(ENABLE=False)
    c.MODEL = CfgNode(
        ARCH="i3d",
        NUM_CLASSES=num_classes,
        FC_INIT_STD=0.01,
        DROPOUT_RATE=0.5,
        HEAD_ACT="sigmoid",
    )
    c.RESNET = CfgNode(
        DEPTH=50,
        NUM_GROUPS=1,
        WIDTH_PER_GROUP=64,
        TRANS_FUNC="bottleneck_transform",
        STRIDE_1X1=False,
        INPLACE_RELU=True,
        ZERO_INIT_FINAL_BN=True,
        NUM_BLOCK_TEMP_KERNEL=[[3], [4], [6], [3]],
        SPATIAL_STRIDES=[[1], [2], [2], [2]],
        SPATIAL_DILATIONS=[[1], [1], [1], [1]],
    )
    c.NONLOCAL = CfgNode(
        LOCATION=[[[]], [[]], [[]], [[]]],
        GROUP=[[1], [1], [1], [1]],
        POOL=[
            [[1, 2, 2], [1, 2, 2]],
            [[1, 2, 2], [1, 2, 2]],
            [[1, 2, 2], [1, 2, 2]],
            [[1, 2, 2], [1, 2, 2]],
        ],
        INSTANTIATION="softmax",
    )
    c.BN = CfgNode(NORM_TYPE="batchnorm", NUM_SPLITS=1, NUM_SYNC_DEVICES=1)
    c.DATA = CfgNode(
        NUM_FRAMES=num_frames,
        CROP_SIZE=crop_size,
        INPUT_CHANNEL_NUM=[3],
    )
    c.MULTIGRID = CfgNode(SHORT_CYCLE=False)
    return c


def build_reference_i3d(num_frames=32, crop_size=224, num_classes=1, seed=0):
    """Return the reference torch ResNet(I3D) in eval mode."""
    _install_fvcore_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch

    torch.manual_seed(seed)
    from slowfast.models.video_model_builder import ResNet

    model = ResNet(_make_cfg(num_frames, crop_size, num_classes))
    model.eval()
    return model


def build_reference_resunet(cls_name: str, num_frames=4, crop_size=32,
                            labels=("rotate", "light", "skip"), seed=0):
    """Return a reference torch ResUNet* variant in eval mode
    (video_model_builder.py:1812 ResUNetContinus / :2046 ResUNetCommon …)."""
    _install_fvcore_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch
    from fvcore.common.config import CfgNode

    torch.manual_seed(seed)
    cfg = _make_cfg(num_frames, crop_size, 1)
    cfg.JITTER = CfgNode(ENABLE=False)
    cfg.DATA.TRAIN_CROP_SIZE = crop_size
    cfg.DATA.TEST_CROP_SIZE = crop_size
    cfg.RESNET.LABELS = list(labels)
    import slowfast.models.video_model_builder as vmb

    model = getattr(vmb, cls_name)(cfg)
    model.eval()
    return model
