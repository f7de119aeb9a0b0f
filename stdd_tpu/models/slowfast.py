"""SlowFast dual-pathway video network + Non-local block.

Completes the reference's model zoo (``slowfast/models/video_model_builder.py:147``
SlowFast, ``:86`` FuseFastToSlow; ``nonlocal_helper.py:10`` Nonlocal). The
shipped detector configs use the single-pathway I3D, but the dual-pathway
net and the non-local block are part of the inventory and usable for
training stronger variants.

Defaults follow the reference config (defaults.py:241-252): ALPHA=8 (fast
samples 8× denser), BETA_INV=8 (fast is 1/8 width), fusion ratio 2, fusion
kernel 5. Input: one clip ``[B, T, H, W, 3]`` — the slow pathway takes every
ALPHA-th frame, the fast pathway all frames (the reference does this split in
its data loader).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import I3DConfig
from .i3d import STAGE_DEPTH, Conv3dBN, ResStage, VideoStem, max_pool_3d

Dtype = Any

# temporal kernel basis for arch "slowfast" (video_model_builder.py:65-72)
SF_TEMP_KERNEL = {
    "slow": ((1,), (1,), (1,), (3,), (3,)),
    "fast": ((5,), (3,), (3,), (3,), (3,)),
}


class FuseFastToSlow(nn.Module):
    """Fast→slow lateral connection: strided temporal conv on the fast
    pathway concatenated onto the slow (video_model_builder.py:86)."""

    dim_in_fast: int
    ratio: int = 2
    kernel: int = 5
    alpha: int = 8
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, slow, fast, train: bool = False):
        fuse = Conv3dBN(
            features=self.dim_in_fast * self.ratio,
            kernel=(self.kernel, 1, 1),
            stride=(self.alpha, 1, 1),
            padding=[(self.kernel // 2, self.kernel // 2), (0, 0), (0, 0)],
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="conv_f2s",
        )(fast, train)
        fuse = nn.relu(fuse)
        return jnp.concatenate([slow, fuse], axis=-1), fast


class SlowFast(nn.Module):
    """Two-pathway ResNet with lateral fusion after s1/s2/s3/s4."""

    cfg: I3DConfig
    alpha: int = 8
    beta_inv: int = 8
    fusion_ratio: int = 2
    fusion_kernel: int = 5
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        d2, d3, d4, d5 = STAGE_DEPTH[c.depth]
        w = c.width_per_group
        dim_inner = c.num_groups * w
        out_ratio = self.beta_inv // self.fusion_ratio
        bn = dict(
            zero_init_final_bn=c.zero_init_final_bn, bn_eps=c.bn_eps,
            bn_momentum=c.bn_momentum, axis_name=self.axis_name, dtype=self.dtype,
        )

        slow_in = x[:, :: self.alpha]
        fast_in = x

        slow = VideoStem(
            features=w, temp_kernel=SF_TEMP_KERNEL["slow"][0][0],
            bn_eps=c.bn_eps, bn_momentum=c.bn_momentum,
            axis_name=self.axis_name, dtype=self.dtype, name="s1_slow",
        )(slow_in, train)
        fast = VideoStem(
            features=w // self.beta_inv, temp_kernel=SF_TEMP_KERNEL["fast"][0][0],
            bn_eps=c.bn_eps, bn_momentum=c.bn_momentum,
            axis_name=self.axis_name, dtype=self.dtype, name="s1_fast",
        )(fast_in, train)
        slow, fast = FuseFastToSlow(
            w // self.beta_inv, self.fusion_ratio, self.fusion_kernel, self.alpha,
            c.bn_eps, c.bn_momentum, self.dtype, name="s1_fuse",
        )(slow, fast, train)

        dims = [
            # (slow_in_extra, slow_out, fast_out, inner, blocks, n_temp, stride)
            (w, w * 4, dim_inner, d2, c.num_block_temp_kernel[0], c.spatial_strides[0]),
            (w * 4, w * 8, dim_inner * 2, d3, c.num_block_temp_kernel[1], c.spatial_strides[1]),
            (w * 8, w * 16, dim_inner * 4, d4, c.num_block_temp_kernel[2], c.spatial_strides[2]),
            (w * 16, w * 32, dim_inner * 8, d5, c.num_block_temp_kernel[3], c.spatial_strides[3]),
        ]
        for si, (din, dout, dinner, blocks, ntemp, stride) in enumerate(dims):
            slow_in_dim = din + (din // out_ratio)
            slow = ResStage(
                dim_in=slow_in_dim, dim_out=dout, dim_inner=dinner,
                temp_kernel_basis=tuple(SF_TEMP_KERNEL["slow"][si + 1]),
                num_blocks=blocks, num_block_temp_kernel=ntemp, stride=stride,
                name=f"s{si + 2}_slow", **bn,
            )(slow, train)
            fast = ResStage(
                dim_in=din // self.beta_inv, dim_out=dout // self.beta_inv,
                dim_inner=dinner // self.beta_inv,
                temp_kernel_basis=tuple(SF_TEMP_KERNEL["fast"][si + 1]),
                num_blocks=blocks, num_block_temp_kernel=ntemp, stride=stride,
                name=f"s{si + 2}_fast", **bn,
            )(fast, train)
            if si < 3:  # fuse after s2/s3/s4 (s5 goes straight to the head)
                slow, fast = FuseFastToSlow(
                    dout // self.beta_inv, self.fusion_ratio, self.fusion_kernel,
                    self.alpha, c.bn_eps, c.bn_momentum, self.dtype,
                    name=f"s{si + 2}_fuse",
                )(slow, fast, train)

        zs = jnp.mean(slow.astype(jnp.float32), axis=(1, 2, 3))
        zf = jnp.mean(fast.astype(jnp.float32), axis=(1, 2, 3))
        z = jnp.concatenate([zs, zf], axis=-1)
        if c.dropout_rate > 0:
            z = nn.Dropout(c.dropout_rate, deterministic=not train)(z)
        return nn.Dense(
            c.num_classes, kernel_init=nn.initializers.normal(c.fc_init_std),
            name="projection",
        )(z)


class Nonlocal(nn.Module):
    """Non-local block (softmax / dot-product instantiation), channels-last
    (nonlocal_helper.py:10). Input/output ``[B, T, H, W, C]``."""

    dim_inner: int
    instantiation: str = "softmax"
    pool_size: Optional[Tuple[int, int, int]] = None
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, H, W, C = x.shape
        theta = nn.Conv(self.dim_inner, (1, 1, 1), name="conv_theta")(x)
        xp = x
        if self.pool_size and any(s > 1 for s in self.pool_size):
            xp = max_pool_3d(
                x, self.pool_size, self.pool_size, [(0, 0)] * 3
            )
        phi = nn.Conv(self.dim_inner, (1, 1, 1), name="conv_phi")(xp)
        g = nn.Conv(self.dim_inner, (1, 1, 1), name="conv_g")(xp)

        t = theta.reshape(B, -1, self.dim_inner)
        p = phi.reshape(B, -1, self.dim_inner)
        gg = g.reshape(B, -1, self.dim_inner)
        aff = jnp.einsum("btc,bpc->btp", t, p)
        if self.instantiation == "softmax":
            aff = jax.nn.softmax(aff * self.dim_inner ** -0.5, axis=2)
        elif self.instantiation == "dot_product":
            aff = aff / aff.shape[2]
        else:
            raise NotImplementedError(self.instantiation)
        out = jnp.einsum("btp,bpc->btc", aff, gg).reshape(B, T, H, W, self.dim_inner)
        out = nn.Conv(C, (1, 1, 1), name="conv_out")(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=1.0 - self.bn_momentum,
            epsilon=self.bn_eps, scale_init=nn.initializers.zeros, name="bn",
        )(out)
        return x + out
