"""ONNX → JAX executor: lowers small inference graphs onto XLA.

The reference runs its face detectors from ONNX via OpenCV's C++ DNN engine
(cv2.FaceDetectorYN in ``preprocessing/yunet/yunet.py:47``). Here the same
ONNX files execute as pure JAX — every conv lands on the MXU, the whole graph
fuses under ``jit``, and batching over frames is a ``vmap`` away.

Supports the op subset used by YuNet/SCRFD-class detectors and the LibreFace
pipeline. Static shapes only (TPU-friendly); the graph is walked in file
order (torch-jit exports are topologically sorted).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.onnx_reader import OnnxGraph, OnnxNode, load_onnx


class OnnxModule:
    """Callable JAX lowering of an ONNX graph.

    ``module(x)`` (single graph input) or ``module(**inputs)`` → dict of
    output arrays. Weights live as a pytree in ``self.params`` so the call is
    functionally pure and jittable: ``jax.jit(module)``.
    """

    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        # Small integer initializers stay numpy so shape-compute subgraphs
        # (Shape→Gather→Unsqueeze→Concat→Resize/Reshape, as exported by
        # SCRFD) constant-fold on host; weights go on device.
        self.params: Dict[str, Any] = {}
        for k, v in graph.initializers.items():
            if v.dtype.kind in "iu" and v.size <= 16:
                self.params[k] = v
            else:
                self.params[k] = jnp.asarray(v)
        self._np_inits = graph.initializers  # host copies for static shapes

    @classmethod
    def from_file(cls, path: str) -> "OnnxModule":
        return cls(load_onnx(path))

    def __call__(self, *args, **kwargs) -> Dict[str, jnp.ndarray]:
        env: Dict[str, jnp.ndarray] = dict(self.params)
        if args:
            assert len(args) == len(self.graph.inputs), (
                f"expected {self.graph.inputs}, got {len(args)} args"
            )
            env.update(zip(self.graph.inputs, args))
        env.update(kwargs)
        for node in self.graph.nodes:
            op = getattr(self, f"_op_{node.op_type.lower()}", None)
            if op is None:
                raise NotImplementedError(f"ONNX op {node.op_type}")
            outs = op(node, [env[i] if i else None for i in node.inputs])
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            for name, val in zip(node.outputs, outs):
                env[name] = val
        return {o: env[o] for o in self.graph.outputs}

    # -- ops ----------------------------------------------------------------

    def _op_conv(self, node: OnnxNode, inputs):
        x, w = inputs[0], inputs[1]
        b = inputs[2] if len(inputs) > 2 else None
        strides = tuple(node.attrs.get("strides", [1, 1]))
        pads = node.attrs.get("pads", [0, 0, 0, 0])
        dil = tuple(node.attrs.get("dilations", [1, 1]))
        group = int(node.attrs.get("group", 1))
        padding = [(pads[0], pads[2]), (pads[1], pads[3])]
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=strides,
            padding=padding,
            rhs_dilation=dil,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=group,
        )
        if b is not None:
            out = out + b.reshape(1, -1, 1, 1)
        return out

    def _op_relu(self, node, inputs):
        return jnp.maximum(inputs[0], 0)

    def _op_leakyrelu(self, node, inputs):
        alpha = node.attrs.get("alpha", 0.01)
        x = inputs[0]
        return jnp.where(x >= 0, x, alpha * x)

    def _op_sigmoid(self, node, inputs):
        return jax.nn.sigmoid(inputs[0])

    def _op_softmax(self, node, inputs):
        axis = node.attrs.get("axis", -1)
        return jax.nn.softmax(inputs[0], axis=axis)

    def _op_exp(self, node, inputs):
        return jnp.exp(inputs[0])

    def _op_add(self, node, inputs):
        return inputs[0] + inputs[1]

    def _op_sub(self, node, inputs):
        return inputs[0] - inputs[1]

    def _op_mul(self, node, inputs):
        return inputs[0] * inputs[1]

    def _op_div(self, node, inputs):
        return inputs[0] / inputs[1]

    def _op_maxpool(self, node, inputs):
        x = inputs[0]
        k = tuple(node.attrs.get("kernel_shape", [2, 2]))
        s = tuple(node.attrs.get("strides", k))
        pads = node.attrs.get("pads", [0, 0, 0, 0])
        ceil_mode = int(node.attrs.get("ceil_mode", 0))
        pad_hw = [(pads[0], pads[2]), (pads[1], pads[3])]
        if ceil_mode:
            # pad up so the window count rounds up, mirroring ONNX ceil_mode
            h, w = x.shape[2], x.shape[3]
            for i, (dim, kk, ss) in enumerate(((h, k[0], s[0]), (w, k[1], s[1]))):
                eff = dim + pad_hw[i][0] + pad_hw[i][1]
                rem = (eff - kk) % ss
                if rem:
                    pad_hw[i] = (pad_hw[i][0], pad_hw[i][1] + (ss - rem))
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 1) + k,
            window_strides=(1, 1) + s,
            padding=[(0, 0), (0, 0)] + pad_hw,
        )

    def _op_averagepool(self, node, inputs):
        x = inputs[0]
        k = tuple(node.attrs.get("kernel_shape", [2, 2]))
        s = tuple(node.attrs.get("strides", k))
        pads = node.attrs.get("pads", [0, 0, 0, 0])
        pad_hw = [(pads[0], pads[2]), (pads[1], pads[3])]
        if int(node.attrs.get("ceil_mode", 0)):
            # pad up so the window count rounds up (as in _op_maxpool); the
            # extra rows are excluded from the divisor below like any pad
            h, w = x.shape[2], x.shape[3]
            for i, (dim, kk, ss) in enumerate(((h, k[0], s[0]), (w, k[1], s[1]))):
                eff = dim + pad_hw[i][0] + pad_hw[i][1]
                rem = (eff - kk) % ss
                if rem:
                    pad_hw[i] = (pad_hw[i][0], pad_hw[i][1] + (ss - rem))
        pad = [(0, 0), (0, 0)] + pad_hw
        out = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, 1) + k,
            window_strides=(1, 1) + s,
            padding=pad,
        )
        if int(node.attrs.get("count_include_pad", 0)) or not any(
            p for hw in pad for p in hw
        ):
            return out / (k[0] * k[1])
        # ONNX default count_include_pad=0: divide each window by the number
        # of NON-pad elements (count via the same reduce over a ones image)
        ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
        counts = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add,
            window_dimensions=(1, 1) + k,
            window_strides=(1, 1) + s,
            padding=pad,
        )
        return out / counts

    def _op_globalaveragepool(self, node, inputs):
        return jnp.mean(inputs[0], axis=(2, 3), keepdims=True)

    def _op_transpose(self, node, inputs):
        return jnp.transpose(inputs[0], node.attrs["perm"])

    def _op_reshape(self, node, inputs):
        x = inputs[0]
        shape_name = node.inputs[1]
        if shape_name in self._np_inits:
            shape = self._np_inits[shape_name]
        else:
            shape = inputs[1]
            if not isinstance(shape, np.ndarray):
                raise NotImplementedError("Reshape with traced shape input")
        shape = np.asarray(shape).astype(np.int64)
        # ONNX: 0 keeps the input dim, -1 infers
        shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
        return x.reshape(shape)

    def _op_flatten(self, node, inputs):
        axis = node.attrs.get("axis", 1)
        x = inputs[0]
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        return x.reshape(lead, -1)

    def _op_concat(self, node, inputs):
        axis = node.attrs.get("axis", 0)
        if all(isinstance(x, np.ndarray) for x in inputs):
            return np.concatenate(inputs, axis=axis)
        return jnp.concatenate([jnp.asarray(x) for x in inputs], axis=axis)

    def _op_resize(self, node, inputs):
        x = inputs[0]
        mode = node.attrs.get("mode", "nearest")
        def resolve(i):
            if len(node.inputs) <= i or not node.inputs[i]:
                return None
            v = self._np_inits.get(node.inputs[i])
            if (v is None or np.size(v) == 0) and isinstance(inputs[i], np.ndarray):
                v = inputs[i]
            return None if v is None or np.size(v) == 0 else v

        scales = resolve(2)
        sizes = resolve(3)
        if sizes is not None and len(sizes):
            out_hw = (int(sizes[2]), int(sizes[3]))
        else:
            out_hw = (
                int(round(x.shape[2] * float(scales[2]))),
                int(round(x.shape[3] * float(scales[3]))),
            )
        if mode == "nearest":
            # asymmetric + floor == plain integer upsampling for scale 2
            ry = out_hw[0] // x.shape[2] if out_hw[0] % x.shape[2] == 0 else 0
            rx = out_hw[1] // x.shape[3] if out_hw[1] % x.shape[3] == 0 else 0
            if ry and rx:
                return jnp.repeat(jnp.repeat(x, ry, axis=2), rx, axis=3)
            return jax.image.resize(x, x.shape[:2] + out_hw, method="nearest")
        return jax.image.resize(x, x.shape[:2] + out_hw, method="linear")

    def _op_gemm(self, node, inputs):
        a, b = inputs[0], inputs[1]
        c = inputs[2] if len(inputs) > 2 else None
        alpha = node.attrs.get("alpha", 1.0)
        beta = node.attrs.get("beta", 1.0)
        if node.attrs.get("transA", 0):
            a = a.T
        if node.attrs.get("transB", 0):
            b = b.T
        out = alpha * (a @ b)
        if c is not None:
            out = out + beta * c
        return out

    def _op_matmul(self, node, inputs):
        return inputs[0] @ inputs[1]

    def _op_batchnormalization(self, node, inputs):
        x, scale, bias, mean, var = inputs[:5]
        eps = node.attrs.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = jax.lax.rsqrt(var + eps)
        return (x - mean.reshape(shape)) * (inv * scale).reshape(shape) + bias.reshape(shape)

    def _op_clip(self, node, inputs):
        lo = node.attrs.get("min", -jnp.inf)
        hi = node.attrs.get("max", jnp.inf)
        if len(inputs) > 1 and inputs[1] is not None:
            lo = inputs[1]
        if len(inputs) > 2 and inputs[2] is not None:
            hi = inputs[2]
        return jnp.clip(inputs[0], lo, hi)

    def _op_identity(self, node, inputs):
        return inputs[0]

    def _op_shape(self, node, inputs):
        # static shapes → host constant, enabling constant-folded Reshape/
        # Resize/Slice chains (SCRFD exports shape-compute subgraphs)
        return np.asarray(inputs[0].shape, np.int64)

    def _op_gather(self, node, inputs):
        axis = node.attrs.get("axis", 0)
        data, idx = inputs[0], inputs[1]
        if isinstance(data, np.ndarray):
            # np.take of a 0-d index returns a np scalar; keep it an ndarray
            return np.asarray(np.take(data, np.asarray(idx).astype(np.int64), axis=axis))
        return jnp.take(data, jnp.asarray(idx), axis=axis)

    def _op_unsqueeze(self, node, inputs):
        axes = node.attrs.get("axes")
        if axes is None and len(node.inputs) > 1:
            axes = np.asarray(self._np_inits.get(node.inputs[1], inputs[1])).tolist()
        x = inputs[0]
        for a in sorted(axes):
            x = np.expand_dims(x, a) if isinstance(x, np.ndarray) else jnp.expand_dims(x, a)
        return x

    def _op_squeeze(self, node, inputs):
        axes = node.attrs.get("axes")
        x = inputs[0]
        if axes is None:
            return x.squeeze()
        return np.squeeze(x, tuple(axes)) if isinstance(x, np.ndarray) else jnp.squeeze(x, tuple(axes))

    def _op_cast(self, node, inputs):
        from ..utils.onnx_reader import _DTYPES

        to = _DTYPES[int(node.attrs.get("to", 1))]
        x = inputs[0]
        return x.astype(to)

    def _op_slice(self, node, inputs):
        x = inputs[0]

        def const(i, default=None):
            if len(node.inputs) > i and node.inputs[i]:
                v = self._np_inits.get(node.inputs[i])
                if v is None and isinstance(inputs[i], np.ndarray):
                    v = inputs[i]
                if v is not None:
                    return np.asarray(v).tolist()
            return default

        starts = const(1)
        ends = const(2)
        axes = const(3, list(range(len(starts))))
        steps = const(4, [1] * len(starts))
        idx = [slice(None)] * x.ndim
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            idx[ax] = slice(st, None if en >= 2**31 - 1 else en, sp)
        return x[tuple(idx)]
