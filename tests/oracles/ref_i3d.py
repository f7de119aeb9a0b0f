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

        def clone(self):
            out = CfgNode()
            for k, v in self.items():
                out[k] = v.clone() if isinstance(v, CfgNode) else v
            return out

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
    use_reference_root(REFERENCE_ROOT)
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
    use_reference_root(REFERENCE_ROOT)
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


def build_reference_ftcn(seed: int = 0):
    """Return the reference FTCN (``I3D8x8`` plugin,
    i3d_temporal_var_fix_dropout_tt_cfg.py with setting/ftcn_tt.yaml) in eval
    mode. Initializes the reference's global config singleton and stubs
    ``timm.models.layers.trunc_normal_``; patches the module-level conv-
    reflection list for newer torch (Conv3d signature grew device/dtype
    kwargs that are not attributes)."""
    import os
    import types

    _install_fvcore_stub()
    import torch

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        tl.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = tm
        tm.layers = tl
        sys.modules.update(
            {"timm": timm, "timm.models": tm, "timm.models.layers": tl})
    use_reference_root(REFERENCE_ROOT)
    cwd = os.getcwd()
    try:
        os.chdir(REFERENCE_ROOT)   # the config resolves YAMLs relative to cwd
        from config import config as ref_cfg

        # init guard: check the instance __dict__ directly — the reference
        # AttrDict auto-vivifies missing ATTRIBUTES to a (truthy) empty
        # AttrDict, and a module-global flag would go stale when
        # use_reference_root evicts and re-imports the config module
        if "setting_name" not in ref_cfg.__dict__:
            ref_cfg.init_with_yaml()
            ref_cfg.update_with_yaml("ftcn_tt.yaml")
            ref_cfg.freeze()
        import model.classifier.i3d_temporal_var_fix_dropout_tt_cfg as plug

        plug.parameters = [p for p in plug.parameters
                           if p not in ("device", "dtype")]
        torch.manual_seed(seed)
        m = plug.I3D8x8()
        m.eval()
        return m
    finally:
        os.chdir(cwd)


def build_reference_slowfast(num_frames=16, crop_size=64, num_classes=1,
                             seed=0, alpha=8, beta_inv=8):
    """Return the reference torch SlowFast (video_model_builder.py:147) in
    eval mode."""
    _install_fvcore_stub()
    use_reference_root(REFERENCE_ROOT)
    import torch
    from fvcore.common.config import CfgNode

    torch.manual_seed(seed)
    cfg = _make_cfg(num_frames, crop_size, num_classes)
    cfg.MODEL.ARCH = "slowfast"
    cfg.SLOWFAST = CfgNode(
        ALPHA=alpha, BETA_INV=beta_inv,
        FUSION_CONV_CHANNEL_RATIO=2, FUSION_KERNEL_SZ=5,
    )
    # two-pathway variants of the per-stage lists
    cfg.DATA.INPUT_CHANNEL_NUM = [3, 3]
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.NONLOCAL.LOCATION = [[[], []], [[], []], [[], []], [[], []]]
    cfg.NONLOCAL.GROUP = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.NONLOCAL.POOL = [
        [[1, 2, 2], [1, 2, 2]], [[1, 2, 2], [1, 2, 2]],
        [[1, 2, 2], [1, 2, 2]], [[1, 2, 2], [1, 2, 2]],
    ]
    from slowfast.models.video_model_builder import SlowFast

    model = SlowFast(cfg)
    model.eval()
    return model


def use_reference_root(root: str) -> None:
    """Make ``root`` the active reference tree on sys.path. Both reference
    trees (altfreezing and dualrun) define a top-level ``model`` package, so
    cached modules imported from ANOTHER reference root are evicted first —
    without this, whichever tree a test imported first silently shadows the
    other's packages (order-dependent ModuleNotFoundError in the full suite).
    """
    evict_tops = set()
    for name, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None) or ""
        if f.startswith("/root/reference/") and not f.startswith(root + "/"):
            evict_tops.add(name.split(".")[0])
    for top in evict_tops:
        for n in list(sys.modules):
            if n == top or n.startswith(top + "."):
                sys.modules.pop(n, None)
    for p in list(sys.path):
        if p.startswith("/root/reference/") and p != root:
            sys.path.remove(p)
    if root not in sys.path:
        sys.path.insert(0, root)
