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


def dual_torch_to_flax(state_dict: Mapping[str, Any], heads: int = 4) -> Dict[str, Any]:
    """Map a reference DualEncoderAU_LMK state dict (dualrun/model/
    dual_encoder.py) onto stdd_tpu's flax DualEncoderAU_LMK params."""
    params: Dict[str, Any] = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def put(path, v):
        _set(params, tuple(path.split("/")), v)

    sd = {k: arr(v) for k, v in state_dict.items()}
    d_model = sd["au_enc.proj.weight"].shape[0]
    head_dim = d_model // heads

    for branch in ("au_enc", "lmk_enc"):
        put(f"{branch}/proj/kernel", sd[f"{branch}.proj.weight"].T)
        put(f"{branch}/proj/bias", sd[f"{branch}.proj.bias"])
        put(f"{branch}/ln_in/scale", sd[f"{branch}.ln_in.weight"])
        put(f"{branch}/ln_in/bias", sd[f"{branch}.ln_in.bias"])
        for i in range(3):
            w = sd[f"{branch}.temporal.{i}.weight"]  # [D,1,3] depthwise
            put(f"{branch}/temporal{i}/kernel", w.transpose(2, 1, 0))
            put(f"{branch}/temporal{i}/bias", sd[f"{branch}.temporal.{i}.bias"])
        put(f"{branch}/pointwise/kernel", sd[f"{branch}.pointwise.weight"].transpose(2, 1, 0))
        put(f"{branch}/pointwise/bias", sd[f"{branch}.pointwise.bias"])
        put(f"{branch}/pool/v", sd[f"{branch}.pool.v"])
        li = 0
        while f"{branch}.encoder.layers.{li}.norm1.weight" in sd:
            pre = f"{branch}.encoder.layers.{li}"
            out = f"{branch}/layer{li}"
            ipw = sd[f"{pre}.self_attn.in_proj_weight"]
            ipb = sd[f"{pre}.self_attn.in_proj_bias"]
            for j, name in enumerate(("query", "key", "value")):
                w = ipw[j * d_model : (j + 1) * d_model]  # [D, D]
                b = ipb[j * d_model : (j + 1) * d_model]
                put(f"{out}/self_attn/{name}/kernel", w.T.reshape(d_model, heads, head_dim))
                put(f"{out}/self_attn/{name}/bias", b.reshape(heads, head_dim))
            ow = sd[f"{pre}.self_attn.out_proj.weight"]  # [D, D]
            put(f"{out}/self_attn/out/kernel", ow.T.reshape(heads, head_dim, d_model))
            put(f"{out}/self_attn/out/bias", sd[f"{pre}.self_attn.out_proj.bias"])
            put(f"{out}/linear1/kernel", sd[f"{pre}.linear1.weight"].T)
            put(f"{out}/linear1/bias", sd[f"{pre}.linear1.bias"])
            put(f"{out}/linear2/kernel", sd[f"{pre}.linear2.weight"].T)
            put(f"{out}/linear2/bias", sd[f"{pre}.linear2.bias"])
            for n in ("norm1", "norm2"):
                put(f"{out}/{n}/scale", sd[f"{pre}.{n}.weight"])
                put(f"{out}/{n}/bias", sd[f"{pre}.{n}.bias"])
            li += 1

    put("head_ln/scale", sd["head.0.weight"])
    put("head_ln/bias", sd["head.0.bias"])
    put("head_fc1/kernel", sd["head.1.weight"].T)
    put("head_fc1/bias", sd["head.1.bias"])
    put("head_fc2/kernel", sd["head.4.weight"].T)
    put("head_fc2/bias", sd["head.4.bias"])
    put("au_from_lmk_ln/scale", sd["au_from_lmk.0.weight"])
    put("au_from_lmk_ln/bias", sd["au_from_lmk.0.bias"])
    put("au_from_lmk_fc/kernel", sd["au_from_lmk.1.weight"].T)
    put("au_from_lmk_fc/bias", sd["au_from_lmk.1.bias"])
    put("proj_au/kernel", sd["proj_au.weight"].T)
    put("proj_au/bias", sd["proj_au.bias"])
    put("proj_lmk/kernel", sd["proj_lmk.weight"].T)
    put("proj_lmk/bias", sd["proj_lmk.bias"])
    if "domain_head.weight" in sd:
        put("domain_head/kernel", sd["domain_head.weight"].T)
        put("domain_head/bias", sd["domain_head.bias"])
    return {"params": params}


def retinaface_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Map the reference RetinaFace (mobilenet0.25) state dict
    (test_tools/ct/detection/alignment.py) onto stdd_tpu's flax RetinaFace."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    sd = {k: arr(v) for k, v in state_dict.items()}

    def put_conv(dst, key):
        w = sd[key + ".weight"]  # [O, I/g, H, W] (depthwise convs included —
        # flax feature_group_count expects the same [H, W, I/g, O] layout)
        _set(params, tuple(dst.split("/")) + ("kernel",), w.transpose(2, 3, 1, 0))
        if key + ".bias" in sd:
            _set(params, tuple(dst.split("/")) + ("bias",), sd[key + ".bias"])

    def put_bn(dst, key):
        _set(params, tuple(dst.split("/")) + ("scale",), sd[key + ".weight"])
        _set(params, tuple(dst.split("/")) + ("bias",), sd[key + ".bias"])
        _set(stats, tuple(dst.split("/")) + ("mean",), sd[key + ".running_mean"])
        _set(stats, tuple(dst.split("/")) + ("var",), sd[key + ".running_var"])

    # backbone
    put_conv("body/s1_conv/conv", "body.stage1.0.0")
    put_bn("body/s1_conv/bn", "body.stage1.0.1")
    stage_map = [("stage1", range(1, 6), "s1_dw"), ("stage2", range(0, 6), "s2_dw"),
                 ("stage3", range(0, 2), "s3_dw")]
    for stage, idxs, prefix in stage_map:
        for n, i in enumerate(idxs):
            base = f"body.{stage}.{i}"
            dst = f"body/{prefix}{n}"
            put_conv(f"{dst}/dw/conv", base + ".0")
            put_bn(f"{dst}/dw/bn", base + ".1")
            put_conv(f"{dst}/pw/conv", base + ".3")
            put_bn(f"{dst}/pw/bn", base + ".4")

    # fpn
    for k in (1, 2, 3):
        put_conv(f"fpn/output{k}/conv", f"fpn.output{k}.0")
        put_bn(f"fpn/output{k}/bn", f"fpn.output{k}.1")
    for k in (1, 2):
        put_conv(f"fpn/merge{k}/conv", f"fpn.merge{k}.0")
        put_bn(f"fpn/merge{k}/bn", f"fpn.merge{k}.1")

    # ssh (note the reference's mixed-case conv7x7_3)
    ssh_names = {"conv3x3": "conv3X3", "conv5x5_1": "conv5X5_1", "conv5x5_2": "conv5X5_2",
                 "conv7x7_2": "conv7X7_2", "conv7x7_3": "conv7x7_3"}
    for s in (1, 2, 3):
        for dst_n, src_n in ssh_names.items():
            put_conv(f"ssh{s}/{dst_n}/conv", f"ssh{s}.{src_n}.0")
            put_bn(f"ssh{s}/{dst_n}/bn", f"ssh{s}.{src_n}.1")

    # heads
    for i in range(3):
        put_conv(f"class_head{i}", f"ClassHead.{i}.conv1x1")
        put_conv(f"bbox_head{i}", f"BboxHead.{i}.conv1x1")
        put_conv(f"ldm_head{i}", f"LandmarkHead.{i}.conv1x1")
    return {"params": params, "batch_stats": stats}


def sub_to_normal_bn(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert Sub-BatchNorm checkpoints to plain-BN naming before conversion
    (reference slowfast/utils/checkpoint.py:340): `bn.bn.running_*` →
    `bn.running_*`, `bn.split_bn.*` dropped, 4-d BN affine params squeezed."""
    new_sd: Dict[str, Any] = {}
    for key, val in state_dict.items():
        if ".split_bn." in key:
            continue
        k = key
        for before, after in (
            ("bn.bn.running_mean", "bn.running_mean"),
            ("bn.bn.running_var", "bn.running_var"),
        ):
            if k.endswith(before):
                k = k[: -len(before)] + after
        if "bn.bn." in k:
            continue
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if (k.endswith("bn.weight") or k.endswith("bn.bias")) and arr.ndim == 4:
            arr = arr[:, 0, 0, 0]
        new_sd[k] = arr
    return new_sd


def resunet_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Map a reference ResUNet* state dict (video_model_builder.py:1128-2742)
    onto :class:`stdd_tpu.models.unet3d.ResUNet3D` variables.

    The encoder (s1..s4) follows the same naming as the I3D converter; the
    per-label decoders are torch Sequentials whose integer indices map onto
    the flax module names:

    - ``t{4,3}_{label}.conv{1,2}.0/.1`` (Conv3dReLU) → ``conv{i}/Conv_0`` +
      ``conv{i}/BatchNorm_0``
    - ``conv1x1_{label}.0/.1/.3`` (mask head) → ``conv1``/``bn``/``conv2``
      (single-conv heads have only ``.0`` → ``conv1``)
    - ``linear`` or ``linear.0`` (verdict head) → ``linear``
    """
    renamed: Dict[str, Any] = {}
    for key, val in state_dict.items():
        k = _strip_prefixes(key)
        parts = k.split(".")
        head = parts[0]
        if head.startswith(("t4_", "t3_")) and parts[2] in ("0", "1"):
            # t4_all.conv1.{0,1}.*  ->  t4_all.conv1.{Conv_0,BatchNorm_0}.*
            # (ResDecoderBlock's conv1/conv2 are ResBlocks whose branch1/a/b/c
            # keys pass straight through to the I3D mapping below)
            parts[2] = {"0": "Conv_0", "1": "BatchNorm_0"}[parts[2]]
            k = ".".join(parts)
        elif head.startswith("conv1x1_"):
            seq = {"0": "conv1", "1": "bn", "3": "conv2"}[parts[1]]
            k = ".".join([parts[0], seq] + parts[2:])
        elif head == "linear" and parts[1] in ("0",):
            k = ".".join([parts[0]] + parts[2:])
        renamed[k] = val
    return i3d_torch_to_flax(renamed)


def ftcn_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Map a reference FTCN (``I3D8x8`` from
    i3d_temporal_var_fix_dropout_tt_cfg.py, the mutated temporal-only ResNet
    + TransformerHead) state dict onto :class:`stdd_tpu.models.ftcn.FTCN`.

    Naming notes: the mutation wraps a strided conv's BN in
    ``Sequential(bn, MaxPool)`` so those keys carry a ``.0`` segment;
    ``branch1``/``branch2.{a,b,c}`` land under our
    ``{shortcut,a,b,c}/Conv3dBN_0``; the head's Residual(PreNorm(..))
    nesting flattens onto ``attn_*``/``mlp_*``/``head_*`` names.
    """
    import re

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def put_p(path: str, v) -> None:
        _set(params, tuple(path.split("/")), v)

    def put_s(path: str, v) -> None:
        _set(stats, tuple(path.split("/")), v)

    HEAD_LINEARS = {
        "to_qkv": "qkv{i}", "to_out.0": "attn_out{i}",
        "net.0": "mlp_fc1_{i}", "net.3": "mlp_fc2_{i}",
    }
    for key, val in state_dict.items():
        k = _strip_prefixes(key)
        if k.endswith("num_batches_tracked"):
            continue
        a = arr(val)
        if k.startswith("head."):
            h = k[len("head."):]
            if h.startswith("fc."):
                put_p("head/proj/kernel" if h.endswith("weight")
                      else "head/proj/bias",
                      a.T if h.endswith("weight") else a)
            elif h == "time_T.cls_token":
                put_p("head/cls_token", a)
            elif h == "time_T.pos_embedding":
                put_p("head/pos_embedding", a)
            elif h.startswith("time_T.mlp_head.0."):
                put_p("head/head_norm/" +
                      ("scale" if h.endswith("weight") else "bias"), a)
            elif h.startswith("time_T.mlp_head.1."):
                put_p("head/head_fc/" +
                      ("kernel" if h.endswith("weight") else "bias"),
                      a.T if h.endswith("weight") else a)
            else:
                m = re.match(
                    r"time_T\.transformer\.layers\.(\d+)\.(\d)\.fn\.(.+)$", h)
                if not m:
                    raise KeyError(f"unhandled FTCN head key: {key}")
                i, half, rest = m.group(1), m.group(2), m.group(3)
                if rest.startswith("norm."):
                    name = ("attn_norm" if half == "0" else "mlp_norm") + i
                    put_p(f"head/{name}/" +
                          ("scale" if rest.endswith("weight") else "bias"), a)
                else:
                    assert rest.startswith("fn.")
                    body = rest[len("fn."):]
                    lin, leaf = body.rsplit(".", 1)
                    name = HEAD_LINEARS[lin].format(i=i)
                    put_p(f"head/{name}/" +
                          ("kernel" if leaf == "weight" else "bias"),
                          a.T if leaf == "weight" else a)
            continue

        # NB: FTCN names its blocks with a literal slash in the flax module
        # name ("s2/pathway0_res0"), so that segment is ONE path component
        m = re.match(r"(s\d)\.pathway0_stem\.(conv|bn)(?:\.0)?\.(.+)$", k)
        if m:
            base = (m.group(1), "Conv3dBN_0")
            mod, leaf = m.group(2), m.group(3)
        else:
            m = re.match(r"(s\d)\.(pathway0_res\d+)\.(.+)$", k)
            if not m:
                raise KeyError(f"unhandled FTCN trunk key: {key}")
            parts = m.group(3).split(".")
            if parts[0] == "branch2":
                parts = parts[1:]
            name = parts[0]
            if name == "branch1":
                sub, mod = "shortcut", "conv"
            elif name == "branch1_bn":
                sub, mod = "shortcut", "bn"
            elif name.endswith("_bn"):
                sub, mod = name[0], "bn"
            else:
                sub, mod = name, "conv"
            parts = parts[1:]
            if parts and parts[0] == "0":     # Sequential(bn, pool) wrapper
                parts = parts[1:]
            base = (f"{m.group(1)}/{m.group(2)}", sub, "Conv3dBN_0")
            leaf = ".".join(parts)

        if mod == "conv" and leaf == "weight":
            _set(params, base + ("conv", "kernel"), a.transpose(2, 3, 4, 1, 0))
        elif mod == "bn" and leaf == "weight":
            _set(params, base + ("bn", "scale"), a)
        elif mod == "bn" and leaf == "bias":
            _set(params, base + ("bn", "bias"), a)
        elif mod == "bn" and leaf == "running_mean":
            _set(stats, base + ("bn", "mean"), a)
        elif mod == "bn" and leaf == "running_var":
            _set(stats, base + ("bn", "var"), a)
        else:
            raise KeyError(f"unhandled FTCN trunk key: {key}")
    return {"params": params, "batch_stats": stats}


def slowfast_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Map a reference SlowFast state dict (video_model_builder.py:147) onto
    :class:`stdd_tpu.models.slowfast.SlowFast` variables: pathway0/1 land in
    the ``*_slow``/``*_fast`` module pairs, the lateral fusions' conv+bn in
    ``s*_fuse/conv_f2s``, and ``head.projection`` in ``projection`` —
    everything else rides the I3D key conventions."""
    import re

    renamed: Dict[str, Any] = {}
    for key, val in state_dict.items():
        k = _strip_prefixes(key)
        m = re.match(r"(s\d)\.pathway([01])_(stem|res\d+)\.(.+)$", k)
        if m:
            side = "slow" if m.group(2) == "0" else "fast"
            k = (f"{m.group(1)}_{side}.pathway0_{m.group(3)}.{m.group(4)}")
        elif re.match(r"s\d_fuse\.conv_f2s\.", k):
            k = k.replace(".conv_f2s.", ".conv_f2s.conv.")
        elif re.match(r"s\d_fuse\.bn\.", k):
            k = k.replace(".bn.", ".conv_f2s.bn.")
        elif k.startswith("head.projection."):
            k = k[len("head."):]
        renamed[k] = val
    return i3d_torch_to_flax(renamed)


def _vit_layer_path(rest: str):
    """Map one reference Transformer layer key tail
    (``layers.{i}.{0|1}.fn.(norm|fn....)``) onto our TransformerEncoder
    names (time_transformer.py:74 vs models/vit.py TransformerEncoder)."""
    import re

    m = re.match(r"layers\.(\d+)\.(\d)\.fn\.(.+)$", rest)
    if not m:
        raise KeyError(rest)
    i, half, body = m.group(1), m.group(2), m.group(3)
    if body.startswith("norm."):
        return (("attn_norm" if half == "0" else "mlp_norm") + i,
                "scale" if body.endswith("weight") else "bias", False)
    assert body.startswith("fn.")
    lin, leaf = body[len("fn."):].rsplit(".", 1)
    name = {"to_qkv": f"qkv{i}", "to_out.0": f"attn_out{i}",
            "net.0": f"mlp_fc1_{i}", "net.3": f"mlp_fc2_{i}"}[lin]
    return name, ("kernel" if leaf == "weight" else "bias"), leaf == "weight"


def videoit_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference VideoiT (time_transformer.py:167) → our VideoiT params."""
    params: Dict[str, Any] = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    for key, val in state_dict.items():
        a = arr(val)
        if key in ("cls_token", "pos_embedding"):
            _set(params, (key,), a)
        elif key.startswith("patch_to_embedding."):
            _set(params, ("patch_to_embedding",
                          "kernel" if key.endswith("weight") else "bias"),
                 a.T if key.endswith("weight") else a)
        elif key.startswith("mlp_head.0."):
            _set(params, ("head_norm",
                          "scale" if key.endswith("weight") else "bias"), a)
        elif key.startswith("mlp_head.1."):
            _set(params, ("mlp_head",
                          "kernel" if key.endswith("weight") else "bias"),
                 a.T if key.endswith("weight") else a)
        elif key.startswith("transformer."):
            name, leaf, tr = _vit_layer_path(key[len("transformer."):])
            _set(params, ("transformer", name, leaf), a.T if tr else a)
        else:
            raise KeyError(f"unhandled VideoiT key: {key}")
    return {"params": params}


def st_transformer_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference SpatialTemporal_Transformer (time_transformer.py:281) → our
    SpatialTemporalTransformer params. The reference's patch-embedding Linear
    is commented out (raw 3·p² patches must equal dim), so our explicit
    projection receives the IDENTITY."""
    params: Dict[str, Any] = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    dim = None
    for key, val in state_dict.items():
        a = arr(val)
        if key in ("space_token", "temporal_token", "pos_embedding"):
            _set(params, (key,), a)
            dim = a.shape[-1]
        elif key.startswith("mlp_head.0."):
            _set(params, ("head_norm",
                          "scale" if key.endswith("weight") else "bias"), a)
        elif key.startswith("mlp_head.1."):
            _set(params, ("mlp_head",
                          "kernel" if key.endswith("weight") else "bias"),
                 a.T if key.endswith("weight") else a)
        elif key.startswith(("space_transformer.", "temporal_transformer.")):
            mod, rest = key.split(".", 1)
            name, leaf, tr = _vit_layer_path(rest)
            _set(params, (mod, name, leaf), a.T if tr else a)
        else:
            raise KeyError(f"unhandled ST-transformer key: {key}")
    assert dim is not None
    _set(params, ("patch_to_embedding", "kernel"), np.eye(dim, dtype=np.float32))
    _set(params, ("patch_to_embedding", "bias"), np.zeros((dim,), np.float32))
    return {"params": params}


def resnet2d_torch_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference 2D ResNet (torchvision-layout ``_resnet_base.py``) → our
    :class:`stdd_tpu.models.resnet2d.ResNet2D` variables."""
    import re

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def put_bn(base, leaf, a):
        if leaf == "weight":
            _set(params, base + ("scale",), a)
        elif leaf == "bias":
            _set(params, base + ("bias",), a)
        elif leaf == "running_mean":
            _set(stats, base + ("mean",), a)
        elif leaf == "running_var":
            _set(stats, base + ("var",), a)
        else:
            raise KeyError(leaf)

    for key, val in state_dict.items():
        k = _strip_prefixes(key)
        if k.endswith("num_batches_tracked"):
            continue
        a = arr(val)
        if k == "conv1.weight":
            _set(params, ("conv1", "kernel"), a.transpose(2, 3, 1, 0))
        elif k.startswith("bn1."):
            put_bn(("bn1",), k.split(".", 1)[1], a)
        elif k.startswith("fc."):
            _set(params, ("fc", "kernel" if k.endswith("weight") else "bias"),
                 a.T if k.endswith("weight") else a)
        else:
            m = re.match(r"layer(\d)\.(\d+)\.(.+)$", k)
            if not m:
                raise KeyError(f"unhandled resnet2d key: {key}")
            blk = f"layer{m.group(1)}_{m.group(2)}"
            rest = m.group(3).split(".")
            if rest[0].startswith("conv"):
                _set(params, (blk, rest[0], "Conv_0", "kernel"),
                     a.transpose(2, 3, 1, 0))
            elif rest[0].startswith("bn"):
                put_bn((blk, "conv" + rest[0][2:], "BatchNorm_0"), rest[1], a)
            elif rest[0] == "downsample":
                if rest[1] == "0":
                    _set(params, (blk, "downsample", "Conv_0", "kernel"),
                         a.transpose(2, 3, 1, 0))
                else:
                    put_bn((blk, "downsample", "BatchNorm_0"), rest[2], a)
            else:
                raise KeyError(f"unhandled resnet2d key: {key}")
    return {"params": params, "batch_stats": stats}
