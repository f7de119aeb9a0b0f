"""I3D-ResNet50 spatiotemporal classifier — the production AltFreezing model.

TPU-native reimplementation of the reference network (structure documented at
reference ``slowfast/models/video_model_builder.py:391`` (ResNet), stem at
``stem_helper.py:102``, bottleneck at ``resnet_helper.py:196``, head at
``head_helper.py:9``, wrapped by ``model/classifier/i3d_ori.py:72`` (I3D8x8)).

Design choices for TPU:

- **Channels-last layout** ``[B, T, H, W, C]`` end to end (NDHWC), the native
  XLA-TPU convolution layout, instead of the reference's NCTHW.
- All convolutions lower to ``lax.conv_general_dilated`` which XLA tiles onto
  the MXU; elementwise BN/ReLU chains fuse into the conv epilogues.
- Optional ``dtype=bfloat16`` compute with float32 params/statistics.
- Sync-BatchNorm across the data mesh axis expressed with ``axis_name`` —
  the JAX-native equivalent of the reference's ``NaiveSyncBatchNorm3d``
  (``slowfast/models/batchnorm_helper.py:112``): flax's BatchNorm computes
  cross-replica statistics with ``lax.pmean`` when an axis name is given.

Parameter tree names intentionally mirror the reference's ``state_dict`` keys
(``s1/pathway0_stem/conv`` …) so checkpoint conversion is a pure name map
(see ``stdd_tpu/utils/torch_convert.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import I3DConfig

Dtype = Any

# Stage depths for ResNet-{18,50,101} (video_model_builder.py:18)
STAGE_DEPTH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _msra_conv_init(key, shape, dtype=jnp.float32):
    """Caffe2-style MSRA fill (fan_out over [kt,kh,kw,cout]); matches
    ``fvcore.nn.weight_init.c2_msra_fill`` used at weight_init_helper.py:28."""
    fan_out = shape[0] * shape[1] * shape[2] * shape[4]
    std = jnp.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


class _RawKernel(nn.Module):
    """Bare conv-kernel parameter at the same tree path nn.Conv would use
    (``<name>/kernel``) so s2d checkpoints stay byte-compatible."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", _msra_conv_init, self.shape)


def _s2d_kernel(w):
    """Re-lay a stem kernel [t,7,7,C,F] for 2×2 space-to-depth input: pad the
    7s to 8 on the LEFT (w'[0]=0), split ky=2my+py / kx=2mx+px, fold
    (py,px,C) into 4C input channels → [t,4,4,4C,F]. Shared by the s2d conv
    and the t2 packed stem so the layout convention cannot desynchronize."""
    t, _, _, C, F = w.shape
    w = jnp.pad(w, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    w = w.reshape(t, 4, 2, 4, 2, C, F).transpose(0, 1, 3, 2, 4, 5, 6)
    return w.reshape(t, 4, 4, 4 * C, F)


def _s2d_input(x):
    """[B,T,H,W,C] → [B,T,H/2,W/2,4C] with channel order (py,px,C), matching
    :func:`_s2d_kernel`'s input-channel fold."""
    B, T, H, W, C = x.shape
    xs = x.reshape(B, T, H // 2, 2, W // 2, 2, C)
    return xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, H // 2, W // 2, 4 * C)


class Conv3dBN(nn.Module):
    """conv3d (no bias) → BatchNorm, with optional zero-init of the BN scale.

    ``s2d=True`` computes the identical stem conv ([t,7,7] stride [1,2,2]
    pad 3 on C=3 input) as a space-to-depth conv: input [..,H,W,3] →
    [..,H/2,W/2,12], kernel zero-padded to [t,8,8,3,F] and re-laid-out to
    [t,4,4,12,F], stride-1 conv with pad (2,1). Exactly the same math (the
    MLPerf-ResNet stem trick), but C=12 stride-1 maps onto the MXU far
    better than C=3 stride-2. Parameters stay in the original [t,7,7,3,F]
    layout — checkpoints are interchangeable."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Optional[Sequence[Tuple[int, int]]] = None  # None = SAME-like from kernel
    zero_init_scale: bool = False
    s2d: bool = False
    int8: bool = False
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def _int8_conv(self, x):
        """Eval-only dynamic-quant conv: s8×s8→s32 runs the MXU at twice the
        bf16 rate, worthwhile for the ≥256-wide stages (s3-s5; the 64-wide s2
        was measured SLOWER — PERF.md "Dead ends"). Weights: per-out-channel
        symmetric int8; activations: per-tensor dynamic symmetric int8 (one
        cheap max-reduction per tensor). Params stay float32 at nn.Conv's
        tree path, so checkpoints are interchangeable with the float path."""
        pad = self.padding
        if pad is None:
            pad = [(k // 2, k // 2) for k in self.kernel]
        w = _RawKernel(self.kernel + (x.shape[-1], self.features),
                       name="conv")()
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2, 3)), 1e-8) / 127.0
        wq = jnp.round(w / sw).astype(jnp.int8)          # |w/sw| ≤ 127
        sx = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, wq, window_strides=self.stride, padding=list(pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (sx * sw)

    def _s2d_conv(self, x):
        t = self.kernel[0]
        assert self.kernel[1:] == (7, 7) and self.stride == (1, 2, 2), (
            "s2d path is specific to the [t,7,7]/[1,2,2] stem")
        B, T, H, W, C = x.shape
        assert H % 2 == 0 and W % 2 == 0
        F = self.features
        w = _RawKernel((t, 7, 7, C, F), name="conv")()
        # out[o] = sum_k w[k]·x(2o-3+k)  ==  sum_{m,p} w'[2m+p]·s2d_p(o-2+m)
        # with w'[0]=0 (left zero pad) — see _s2d_kernel/_s2d_input
        w = _s2d_kernel(w)
        xs = _s2d_input(x)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=[(t // 2, t // 2), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d:
            return self._bn(self._s2d_conv(x), train)
        if self.int8 and not train:
            return self._bn(self._int8_conv(x), train)
        pad = self.padding
        if pad is None:
            pad = [(k // 2, k // 2) for k in self.kernel]
        x = nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=pad,
            use_bias=False,
            kernel_init=_msra_conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return self._bn(x, train)

    def _bn(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.bn_momentum,  # flax decay = 1 - torch momentum
            epsilon=self.bn_eps,
            scale_init=nn.initializers.zeros if self.zero_init_scale else nn.initializers.ones,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


def max_pool_3d(x, window, strides, padding):
    """3D max pool over [B,T,H,W,C]; padding is per-spatial-dim (lo,hi) pairs."""
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


class _BNStats(nn.Module):
    """Bare BatchNorm parameters/statistics at nn.BatchNorm's tree paths
    (``<name>/{scale,bias}`` in params, ``<name>/{mean,var}`` in batch_stats)
    so checkpoints are interchangeable with the plain-BN stem path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (self.features,)
        )
        var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (self.features,)
        )
        return scale, bias, mean.value, var.value


class _StemParams(nn.Module):
    """Stem conv kernel + BN stats, tree-compatible with Conv3dBN."""

    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        w = _RawKernel(self.kernel_shape, name="conv")()
        return (w,) + tuple(_BNStats(self.kernel_shape[-1], name="bn")())


class _BottleneckParams(nn.Module):
    """The three Conv3dBN parameter sets of a Bottleneck at Bottleneck's
    tree paths (``branch2/{a,b,c}/{conv,bn}``) — the fused eval path
    declares the SAME tree the conv path does, so checkpoints interchange
    (same pattern as the t2 stem's _StemParams)."""

    tk: int
    dim_in: int
    dim_inner: int
    dim_out: int

    @nn.compact
    def __call__(self):
        pa = _StemParams((self.tk, 1, 1, self.dim_in, self.dim_inner), name="a")()
        pb = _StemParams((1, 3, 3, self.dim_inner, self.dim_inner), name="b")()
        pc = _StemParams((1, 1, 1, self.dim_inner, self.dim_out), name="c")()
        return pa, pb, pc


def _t2_cell_range(tk: int) -> Tuple[int, int]:
    """Temporal cell offsets touched by a tk-tap stride-1 conv when output
    frames are packed in pairs: out[2p+ot] reads in[2p+ot-tk//2 .. 2p+ot+tk//2]."""
    lo = (0 - (tk // 2)) // 2  # floor division handles negatives
    hi = (1 + (tk // 2)) // 2
    return lo, hi


def pack_stem_kernel_t2(w, scale, bias, mean, var, eps):
    """Fold eval-BN into the stem kernel and re-lay it out for the
    space-to-depth × temporal-pair packed convolution.

    ``w`` [tk,7,7,C,F] → packed ``[M,4,4,8C,2F]`` (M temporal cell taps;
    input channels = (tpos 2, spos 2x2, C); output channels = (ot 2, F)),
    plus the folded bias ``[2F]``. Math: identical to conv → BN(eval) with
    the running statistics — BN is a per-channel affine at eval time, so it
    folds exactly (in float32) into the kernel and a bias term.
    """
    tk, _, _, C, F = w.shape
    inv = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    wf = w.astype(jnp.float32) * inv  # broadcast over trailing F
    bf = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    wf = _s2d_kernel(wf)  # spatial 2x2 space-to-depth, shared with Conv3dBN
    # temporal pair packing: (ot, kt) → cell offset m, in-cell position q
    m_lo, m_hi = _t2_cell_range(tk)
    M = m_hi - m_lo + 1
    wk = jnp.zeros((M, 4, 4, 2, 4 * C, 2, F), jnp.float32)
    for ot in range(2):
        for kt in range(tk):
            r = ot - tk // 2 + kt
            m, q = divmod(r, 2)  # python floor semantics for negative r
            wk = wk.at[m - m_lo, :, :, q, :, ot, :].add(wf[kt])
    return wk.reshape(M, 4, 4, 8 * C, 2 * F), jnp.tile(bf, 2)


def stem_forward_t2(x, w_packed, bias2f, tk: int, dtype=jnp.float32):
    """Packed stem: s2d2 + T-pair packing → shifted 2D convs (full 128-lane
    MXU output tiling) → bias → ReLU → maxpool in packed space → unpack.

    Exactly the stem conv [tk,7,7]/[1,2,2] + BN(eval) + ReLU +
    maxpool [1,3,3]/[1,2,2]; measured ~1.5× the conv3d s2d stem on TPU v5e
    (the 64-feature stem wastes half the MXU output lanes; packing two
    output frames into channels fills them at only a 6/5 FLOP overhead).
    """
    B, T, H, W, C = x.shape
    assert T % 2 == 0 and H % 2 == 0 and W % 2 == 0
    M, _, _, _, F2 = w_packed.shape
    F = F2 // 2
    xs = _s2d_input(x)  # space-to-depth 2x2, shared with Conv3dBN
    # temporal pair pack: channel = (q, 4C)
    Tc = T // 2
    xs = xs.reshape(B, Tc, 2, H // 2, W // 2, 4 * C).transpose(0, 1, 3, 4, 2, 5)
    xs = xs.reshape(B, Tc, H // 2, W // 2, 8 * C).astype(dtype)
    m_lo, m_hi = _t2_cell_range(tk)
    xm = jnp.pad(xs, ((0, 0), (-m_lo, m_hi), (0, 0), (0, 0), (0, 0)))
    wp = w_packed.astype(dtype)
    out = None
    for m in range(M):
        xsl = xm[:, m : m + Tc].reshape(B * Tc, H // 2, W // 2, 8 * C)
        y = jax.lax.conv_general_dilated(
            xsl, wp[m], (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    y = out.reshape(B, Tc, H // 2, W // 2, F2) + bias2f.astype(dtype)
    y = nn.relu(y)
    # maxpool [1,3,3]/[1,2,2]: spatial-only, so packed (ot, f) channels pool
    # independently — exact
    y = nn.max_pool(y, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])
    Hp, Wp = y.shape[2], y.shape[3]
    y = y.reshape(B, Tc, Hp, Wp, 2, F).transpose(0, 1, 4, 2, 3, 5)
    return y.reshape(B, T, Hp, Wp, F)


class VideoStem(nn.Module):
    """s1: conv [t,7,7] stride [1,2,2] → BN → ReLU → maxpool [1,3,3]/[1,2,2]
    (reference stem_helper.py:156-171)."""

    features: int
    temp_kernel: int
    bn_eps: float
    bn_momentum: float
    axis_name: Optional[str]
    dtype: Dtype
    s2d: bool = False
    t2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = self.temp_kernel
        if self.t2 and not train and x.shape[1] % 2 == 0:
            # eval-only fully-packed stem: BN folds into the kernel (exact at
            # eval — BN is a per-channel affine of the running stats), conv
            # runs with 128 output lanes, pool runs in packed space. Same
            # parameter tree as the Conv3dBN path (checkpoints interchange).
            w, scale, bias, mean, var = _StemParams(
                (t, 7, 7, x.shape[-1], self.features), name="pathway0_stem"
            )()
            wp, b2 = pack_stem_kernel_t2(w, scale, bias, mean, var, self.bn_eps)
            return stem_forward_t2(x, wp, b2, t, dtype=self.dtype)
        x = Conv3dBN(
            features=self.features,
            kernel=(t, 7, 7),
            stride=(1, 2, 2),
            padding=[(t // 2, t // 2), (3, 3), (3, 3)],
            s2d=self.s2d,
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="pathway0_stem",
        )(x, train)
        x = nn.relu(x)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])
        return x


class Bottleneck(nn.Module):
    """Tx1x1 → 1x3x3 (spatial stride here) → 1x1x1, BN after each
    (reference resnet_helper.py:196 BottleneckTransform).

    When ``spatial_1x1`` is set, the middle conv collapses to 1x1x1 — the FTCN
    "temporal-only" variant (reference i3d_temporal_var_fix_dropout_tt_cfg.py:207).
    """

    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    zero_init_final_bn: bool
    bn_eps: float
    bn_momentum: float
    axis_name: Optional[str]
    dtype: Dtype
    spatial_1x1: bool = False
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        tk = self.temp_kernel_size
        x = Conv3dBN(
            features=self.dim_inner,
            kernel=(tk, 1, 1),
            stride=(1, 1, 1),
            padding=[(tk // 2, tk // 2), (0, 0), (0, 0)],
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            int8=self.int8,
            name="a",
        )(x, train)
        x = nn.relu(x)
        ks = 1 if self.spatial_1x1 else 3
        x = Conv3dBN(
            features=self.dim_inner,
            kernel=(1, ks, ks),
            stride=(1, self.stride, self.stride),
            padding=[(0, 0), (ks // 2, ks // 2), (ks // 2, ks // 2)],
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            int8=self.int8,
            name="b",
        )(x, train)
        x = nn.relu(x)
        x = Conv3dBN(
            features=self.dim_out,
            kernel=(1, 1, 1),
            stride=(1, 1, 1),
            padding=[(0, 0), (0, 0), (0, 0)],
            zero_init_scale=self.zero_init_final_bn,
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            int8=self.int8,
            name="c",
        )(x, train)
        return x


class ResBlock(nn.Module):
    """Residual block with projection shortcut when dims/stride change
    (reference resnet_helper.py:329)."""

    dim_in: int
    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    zero_init_final_bn: bool
    bn_eps: float
    bn_momentum: float
    axis_name: Optional[str]
    dtype: Dtype
    spatial_1x1: bool = False
    fused_eval: bool = False
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (
            self.fused_eval and not train and self.stride == 1
            and not self.spatial_1x1
        ):
            return self._fused(x)
        branch2 = Bottleneck(
            dim_out=self.dim_out,
            dim_inner=self.dim_inner,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            zero_init_final_bn=self.zero_init_final_bn,
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            spatial_1x1=self.spatial_1x1,
            int8=self.int8,
            name="branch2",
        )(x, train)
        if self.dim_in != self.dim_out or self.stride != 1:
            shortcut = Conv3dBN(
                features=self.dim_out,
                kernel=(1, 1, 1),
                stride=(1, self.stride, self.stride),
                padding=[(0, 0), (0, 0), (0, 0)],
                bn_eps=self.bn_eps,
                bn_momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
                int8=self.int8,
                name="shortcut",
            )(x, train)
        else:
            shortcut = x
        return nn.relu(shortcut + branch2)

    def _fused(self, x):
        """Eval-only fused bottleneck: BN folds into the conv weights (exact
        — BN at eval is a per-channel affine of the running stats) and the
        whole a→b→c→(+res)→relu block runs as ONE Pallas pass, so the
        64-channel intermediates never round-trip HBM (the s2 stage is
        bandwidth-bound at the production shape — see
        ops/bottleneck_pallas.py). Same parameter tree as the conv path."""
        from ..ops.bottleneck_pallas import fold_bn, fused_bottleneck

        tk = self.temp_kernel_size
        Cin, Ci, Co = self.dim_in, self.dim_inner, self.dim_out
        pa, pb, pc = _BottleneckParams(
            tk=tk, dim_in=Cin, dim_inner=Ci, dim_out=Co, name="branch2")()
        wa, ba = fold_bn(pa[0].reshape(tk, Cin, Ci), *pa[1:], self.bn_eps)
        wb, bb = fold_bn(pb[0].reshape(3, 3, Ci, Ci), *pb[1:], self.bn_eps)
        wc, bc = fold_bn(pc[0].reshape(Ci, Co), *pc[1:], self.bn_eps)
        ws = bs = None
        if Cin != Co:
            ps = _StemParams((1, 1, 1, Cin, Co), name="shortcut")()
            ws, bs = fold_bn(ps[0].reshape(Cin, Co), *ps[1:], self.bn_eps)
        T, H = x.shape[1], x.shape[2]
        tile_t = next(t for t in (8, 4, 2, 1) if T % t == 0)
        tile_h = next(h for h in (14, 16, 8, 7, 4, 2, 1) if H % h == 0)
        return fused_bottleneck(
            x, wa, ba, wb, bb, wc, bc, ws, bs, tk=tk,
            tile_t=tile_t, tile_h=tile_h,
            # Mosaic kernels only lower on TPU; interpret everywhere else
            # (CPU tests, GPU backends) so the model stays loadable
            interpret=jax.default_backend() != "tpu",
            out_dtype=self.dtype,
        ).astype(self.dtype)


def stage_temp_kernels(basis: Sequence[int], num_blocks: int, num_temp: int) -> Tuple[int, ...]:
    """Per-block temporal kernels: tile the basis, truncate to ``num_temp``
    blocks, pad the rest with 1 (reference resnet_helper.py:530-534)."""
    tiled = (tuple(basis) * num_blocks)[:num_temp]
    return tiled + (1,) * (num_blocks - num_temp)


class ResStage(nn.Module):
    """One stage of the 3D ResNet (reference resnet_helper.py:447)."""

    dim_in: int
    dim_out: int
    dim_inner: int
    temp_kernel_basis: Tuple[int, ...]
    num_blocks: int
    num_block_temp_kernel: int
    stride: int
    zero_init_final_bn: bool
    bn_eps: float
    bn_momentum: float
    axis_name: Optional[str]
    dtype: Dtype
    spatial_1x1: bool = False
    fused_eval: bool = False
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        tks = stage_temp_kernels(self.temp_kernel_basis, self.num_blocks, self.num_block_temp_kernel)
        for i in range(self.num_blocks):
            x = ResBlock(
                dim_in=self.dim_in if i == 0 else self.dim_out,
                dim_out=self.dim_out,
                dim_inner=self.dim_inner,
                temp_kernel_size=tks[i],
                stride=self.stride if i == 0 else 1,
                zero_init_final_bn=self.zero_init_final_bn,
                bn_eps=self.bn_eps,
                bn_momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
                spatial_1x1=self.spatial_1x1,
                fused_eval=self.fused_eval,
                int8=self.int8,
                name=f"pathway0_res{i}",
            )(x, train)
        return x


class I3DHead(nn.Module):
    """Global avg pool → dropout → linear → logits (reference head_helper.py:9).
    The reference head's activation is commented out: raw logits come out and
    callers apply sigmoid (demo.py:328)."""

    num_classes: int
    dropout_rate: float
    fc_init_std: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T', H', W', C] — average over all spatiotemporal positions.
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=self.fc_init_std),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="projection",
        )(x)
        return x


class I3D(nn.Module):
    """The full I3D-ResNet: s1 → s2 → T-maxpool → s3 → s4 → s5 → head.

    Input:  ``[B, T, H, W, 3]`` float (already normalized).
    Output: ``[B, num_classes]`` raw logits.
    """

    cfg: I3DConfig
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        """``return_features=True`` additionally returns the pooled
        penultimate embedding [B, 2048] — the reference captures this with a
        forward hook for its RGB-fusion branch (altfreezing/feature.py:104)."""
        c = self.cfg
        d2, d3, d4, d5 = STAGE_DEPTH[c.depth]
        w = c.width_per_group
        dim_inner = c.num_groups * w
        bn = dict(
            zero_init_final_bn=c.zero_init_final_bn,
            bn_eps=c.bn_eps,
            bn_momentum=c.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )

        x = x.astype(self.dtype)
        x = VideoStem(
            features=w,
            temp_kernel=c.temp_kernel[0][0],
            bn_eps=c.bn_eps,
            bn_momentum=c.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            s2d=c.s2d_stem,
            t2=c.stem_t2,
            name="s1",
        )(x, train)

        stages = [
            # (name, dim_in, dim_out, dim_inner, basis, blocks, n_temp, stride, spatial_1x1)
            ("s2", w, w * 4, dim_inner, c.temp_kernel[1], d2, c.num_block_temp_kernel[0], c.spatial_strides[0]),
            ("s3", w * 4, w * 8, dim_inner * 2, c.temp_kernel[2], d3, c.num_block_temp_kernel[1], c.spatial_strides[1]),
            ("s4", w * 8, w * 16, dim_inner * 4, c.temp_kernel[3], d4, c.num_block_temp_kernel[2], c.spatial_strides[2]),
            ("s5", w * 16, w * 32, dim_inner * 8, c.temp_kernel[4], d5, c.num_block_temp_kernel[3], c.spatial_strides[3]),
        ]
        # FTCN truncation: stop_point=k removes stages s_k..s5 (reference
        # i3d_temporal_var_fix_dropout_tt_cfg.py:315-330)
        n_stages = min(len(stages), max(1, c.stop_point - 2)) if c.temporal_only else len(stages)
        for si, (name, di, do, dinner, basis, blocks, ntemp, stride) in enumerate(stages[:n_stages]):
            x = ResStage(
                dim_in=di,
                dim_out=do,
                dim_inner=dinner,
                temp_kernel_basis=tuple(basis),
                num_blocks=blocks,
                num_block_temp_kernel=ntemp,
                stride=stride,
                spatial_1x1=c.temporal_only,
                # eval-only fused s2 bottlenecks (ops/bottleneck_pallas.py):
                # the HBM-bandwidth-bound stage at production shapes
                fused_eval=(si == 0 and c.fused_s2),
                # int8 dynamic-quant eval path for the wide stages (s3-s5;
                # s2's 64-wide convs measured slower — PERF.md "Dead ends")
                int8=(name in c.int8_stages),
                name=name,
                **bn,
            )(x, train)
            if si == 0 and c.t_pool_after_s2 > 1:
                # pathway0_pool: MaxPool3d [2,1,1] (video_model_builder.py:477)
                x = max_pool_3d(
                    x,
                    (c.t_pool_after_s2, 1, 1),
                    (c.t_pool_after_s2, 1, 1),
                    [(0, 0), (0, 0), (0, 0)],
                )

        feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        x = I3DHead(
            num_classes=c.num_classes,
            dropout_rate=c.dropout_rate,
            fc_init_std=c.fc_init_std,
            dtype=self.dtype,
            name="head",
        )(x, train)
        if return_features:
            return x, feats
        return x


# ---------------------------------------------------------------------------
# Convenience: normalization + scoring wrappers (reference demo.py:84-87,
# TEST2.py:147-149 — identical ImageNet constants in three places).

# numpy on purpose: a module-scope jnp.array initializes the backend at
# IMPORT time — through the axon relay a dead backend blocks ~18 min, which
# hung even `--help` on every CLI that transitively imports this module
# (observed during the 2026-08-18 outage). jnp ops consume numpy directly.
IMAGENET_MEAN = np.array([0.485 * 255, 0.456 * 255, 0.406 * 255], dtype=np.float32)
IMAGENET_STD = np.array([0.229 * 255, 0.224 * 255, 0.225 * 255], dtype=np.float32)


def normalize_clip(x_uint8):
    """``uint8 [.., H, W, 3]`` RGB → ImageNet-normalized float32."""
    return (x_uint8.astype(jnp.float32) - IMAGENET_MEAN) / IMAGENET_STD


def make_forward(model: I3D, train: bool = False):
    """Return ``f(variables, clips) -> logits`` suitable for ``jax.jit``."""

    def fwd(variables, clips):
        return model.apply(variables, clips, train=train)

    return fwd
