"""Convert reference PyTorch checkpoints to stdd_tpu flax variables.

The reference stores I3D checkpoints as ``{"classifier": state_dict, ...}``
(or a bare state dict) with keys like ``resnet.s2.pathway0_res0.branch2.a.weight``
(see reference ``model/_base.py:39`` ``ModelBase.load`` for its tolerant
prefix-stripping loader — we mirror that tolerance here).

Layout conversions:
- Conv3d  torch ``[O, I, T, H, W]``  → flax ``[T, H, W, I, O]``
- Linear  torch ``[O, I]``           → flax ``[I, O]``
- BatchNorm weight/bias → scale/bias; running_mean/var → batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _strip_prefixes(key: str) -> str:
    for pre in ("module.", "model.", "classifier.", "resnet."):
        if key.startswith(pre):
            key = key[len(pre):]
    return key


def i3d_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Map a reference I3D state dict to ``{"params":…, "batch_stats":…}``."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for key, val in state_dict.items():
        key = _strip_prefixes(key)
        if key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        parts = key.split(".")
        mods, leaf = parts[:-1], parts[-1]

        # Flatten the reference's naming onto ours:
        #   branch1 -> shortcut/conv, branch1_bn -> shortcut/bn
        #   a -> a/conv, a_bn -> a/bn  (same for b, c)
        #   pathway0_stem.conv -> pathway0_stem/conv, .bn -> /bn
        path = []
        i = 0
        while i < len(mods):
            m = mods[i]
            if m == "branch1":
                path += ["shortcut", "conv"]
            elif m == "branch1_bn":
                path += ["shortcut", "bn"]
            elif m in ("a", "b", "c") and leaf == "weight" and arr.ndim == 5:
                path += [m, "conv"]
            elif m in ("a_bn", "b_bn", "c_bn"):
                path += [m[0], "bn"]
            else:
                path.append(m)
            i += 1
        path = tuple(path)

        if arr.ndim == 5 and leaf == "weight":          # conv kernel
            _set(params, path + ("kernel",), arr.transpose(2, 3, 4, 1, 0))
        elif arr.ndim == 2 and leaf == "weight":        # linear
            _set(params, path + ("kernel",), arr.T)
        elif leaf == "weight":                           # bn scale
            _set(params, path + ("scale",), arr)
        elif leaf == "bias":
            _set(params, path + ("bias",), arr)
        elif leaf == "running_mean":
            _set(stats, path + ("mean",), arr)
        elif leaf == "running_var":
            _set(stats, path + ("var",), arr)
        else:
            raise KeyError(f"unhandled checkpoint key: {key}")
    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` and convert (handles the trainer's
    ``{"classifier": …}`` wrapping, reference model/_base.py:56-95)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "classifier" in obj:
        obj = obj["classifier"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return i3d_torch_to_flax(obj)
