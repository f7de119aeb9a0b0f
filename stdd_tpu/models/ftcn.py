"""FTCN — Fully Temporal Convolution Network variant of the I3D.

Rebuild of the reference's ``ftcn_tt`` classifier
(``model/classifier/i3d_temporal_var_fix_dropout_tt_cfg.py``): the I3D with
every spatial conv kernel collapsed to 1×1 (``temporal_only_conv`` at ``:207``
— with keep_stride_count=0 each spatial stride-2 conv becomes stride-1 with a
MaxPool3d(1,2,2) appended after its BN), stages truncated at ``stop_point``
(``:315-330``; the shipped ftcn_tt.yaml uses stop_point=5 → s2..s4 only), and
a TimeTransformer head (``TransformerHead`` at ``:126`` + ``time_transformer.py:219``):
spatial average-pool → T time tokens → cls-token ViT (depth 1, heads 16,
dim_head 64, mlp 2048) → 1 logit.

Rather than mutating a built network like the reference does, the surgery is
expressed directly in the module structure (same math, static graph).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import I3DConfig
from .i3d import STAGE_DEPTH, Conv3dBN, max_pool_3d, stage_temp_kernels

Dtype = Any


class TemporalConvBN(nn.Module):
    """Tx1x1 conv (stride 1) → BN → optional MaxPool(1,2,2) standing in for a
    removed spatial stride (reference temporal_only_conv semantics)."""

    features: int
    temp_kernel: int
    spatial_pool: bool
    zero_init_scale: bool = False
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = self.temp_kernel
        x = Conv3dBN(
            features=self.features,
            kernel=(t, 1, 1),
            stride=(1, 1, 1),
            padding=[(t // 2, t // 2), (0, 0), (0, 0)],
            zero_init_scale=self.zero_init_scale,
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, train)
        if self.spatial_pool:
            x = max_pool_3d(x, (1, 2, 2), (1, 2, 2), [(0, 0), (0, 0), (0, 0)])
        return x


class FTCNBlock(nn.Module):
    """Temporal-only bottleneck residual block."""

    dim_in: int
    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    bn_eps: float
    bn_momentum: float
    axis_name: Optional[str]
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        pool = self.stride == 2
        h = TemporalConvBN(
            self.dim_inner, self.temp_kernel_size, spatial_pool=False,
            bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
            axis_name=self.axis_name, dtype=self.dtype, name="a",
        )(x, train)
        h = nn.relu(h)
        h = TemporalConvBN(
            self.dim_inner, 1, spatial_pool=pool,
            bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
            axis_name=self.axis_name, dtype=self.dtype, name="b",
        )(h, train)
        h = nn.relu(h)
        h = TemporalConvBN(
            self.dim_out, 1, spatial_pool=False, zero_init_scale=True,
            bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
            axis_name=self.axis_name, dtype=self.dtype, name="c",
        )(h, train)
        if self.dim_in != self.dim_out or self.stride != 1:
            sc = TemporalConvBN(
                self.dim_out, 1, spatial_pool=pool,
                bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                axis_name=self.axis_name, dtype=self.dtype, name="shortcut",
            )(x, train)
        else:
            sc = x
        return nn.relu(sc + h)


def _interior_indices(h: int, w: int) -> jnp.ndarray:
    """Spatial indices the random pools may pick (reference ``valid_idx`` at
    i3d_temporal_var_fix_dropout_tt_cfg.py:97 — note it divides by ``h`` for
    BOTH coordinates; the quirk is replicated)."""
    idx = [i for i in range(h * w)
           if not (i % h == 0 or i // h == h - 1 or i % h == h - 1)]
    return jnp.asarray(idx, jnp.int32)


class TimeTransformerHead(nn.Module):
    """Token pool → cls-token ViT → logit (reference TransformerHead at
    i3d_temporal_var_fix_dropout_tt_cfg.py:126 + time_transformer.py:219).

    ``patch_type`` selects the token pool (reference :131-:147):
      - ``time``: spatial avg-pool → T tokens (shipped ftcn_tt default)
      - ``spatial``: temporal avg-pool → H·W tokens
      - ``random``: one interior spatial site per clip (train w/
        random_select; eval = center site, RandomPatchPool :74)
      - ``random_avg``: mean over k random interior sites (train) / all
        interior sites (eval) (RandomAvgPool :105)
      - ``all``: every T·H·W position is a token
    Random draws use the ``patch`` PRNG stream.
    """

    num_patches: int
    dim: int
    depth: int = 1
    heads: int = 16
    dim_head: int = 64
    mlp_dim: int = 2048
    dropout: float = 0.1
    num_classes: int = 1
    patch_type: str = "time"
    random_select: bool = False
    k: int = 8
    dtype: Dtype = jnp.float32

    def _pool(self, x, train: bool):
        # x: [B, T, H, W, C] → tokens [B, N, C]
        B, T, H, W, C = x.shape
        if self.patch_type == "time":
            return jnp.mean(x, axis=(2, 3))
        if self.patch_type == "spatial":
            return jnp.mean(x, axis=1).reshape(B, H * W, C)
        if self.patch_type == "all":
            return x.reshape(B, T * H * W, C)
        flat = x.reshape(B, T, H * W, C)
        interior = _interior_indices(H, W)
        if self.patch_type == "random":
            if train and self.random_select:
                pick = jax.random.choice(self.make_rng("patch"), interior)
            else:
                pick = jnp.asarray(H * W // 2, jnp.int32)
            return flat[:, :, pick, :]
        if self.patch_type == "random_avg":
            if train and self.random_select:
                sites = jax.random.choice(
                    self.make_rng("patch"), interior, (self.k,), replace=False
                )
            else:
                sites = interior
            return jnp.mean(flat[:, :, sites, :], axis=2)
        raise NotImplementedError(self.patch_type)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self._pool(x.astype(jnp.float32), train)
        B, N, C = x.shape
        assert N == self.num_patches, (N, self.num_patches)
        if self.dim != C:   # projection when dim != in_channels (ref :156-158)
            x = nn.Dense(self.dim, name="proj")(x)

        cls = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, self.num_patches + 1, self.dim)
        )
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], axis=1) + pos
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        inner = self.heads * self.dim_head
        for i in range(self.depth):
            # pre-norm attention with residual
            h = nn.LayerNorm(name=f"attn_norm{i}")(x)
            qkv = nn.Dense(inner * 3, use_bias=False, name=f"qkv{i}")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads_split(t):
                return t.reshape(B, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

            q, k, v = map(heads_split, (q, k, v))
            att = jax.nn.softmax(
                jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5, axis=-1
            )
            o = jnp.einsum("bhij,bhjd->bhid", att, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, -1, inner)
            o = nn.Dense(self.dim, name=f"attn_out{i}")(o)
            o = nn.Dropout(self.dropout, deterministic=not train)(o)
            x = x + o
            # pre-norm MLP with residual
            h = nn.LayerNorm(name=f"mlp_norm{i}")(x)
            h = nn.gelu(nn.Dense(self.mlp_dim, name=f"mlp_fc1_{i}")(h))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.Dense(self.dim, name=f"mlp_fc2_{i}")(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = x + h

        cls_out = nn.LayerNorm(name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, name="head_fc")(cls_out)


class FTCN(nn.Module):
    """Temporal-only I3D trunk + TimeTransformer head.

    Input ``[B, T, H, W, 3]`` → logits ``[B, num_classes]``.
    """

    cfg: I3DConfig
    patch_type: str = "time"           # head token pool (ref :131-:147)
    random_select: bool = False
    patch_k: int = 8
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        depths = STAGE_DEPTH[c.depth]
        w = c.width_per_group
        dim_inner = c.num_groups * w
        common = dict(
            bn_eps=c.bn_eps, bn_momentum=c.bn_momentum,
            axis_name=self.axis_name, dtype=self.dtype,
        )

        x = x.astype(self.dtype)
        # stem: [5,1,1] conv (spatial 7x7 removed) + pool for the removed
        # stride, then the stem's own 1x3x3 maxpool survives
        x = TemporalConvBN(
            w, c.temp_kernel[0][0], spatial_pool=True, name="s1", **common
        )(x, train)
        x = nn.relu(x)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])

        stage_dims = [
            (w, w * 4, dim_inner),
            (w * 4, w * 8, dim_inner * 2),
            (w * 8, w * 16, dim_inner * 4),
            (w * 16, w * 32, dim_inner * 8),
        ]
        # reference truncation: s_i -> Identity for stop_point <= i
        # (i3d_temporal_var_fix_dropout_tt_cfg.py:315-330); shipped
        # ftcn_tt.yaml stop_point=5 keeps s2..s4 (1024-ch head)
        n_stages = max(1, min(4, c.stop_point - 2))
        for si in range(n_stages):
            di, do, dinner = stage_dims[si]
            tks = stage_temp_kernels(
                c.temp_kernel[si + 1], depths[si], c.num_block_temp_kernel[si]
            )
            for bi in range(depths[si]):
                x = FTCNBlock(
                    dim_in=di if bi == 0 else do,
                    dim_out=do,
                    dim_inner=dinner,
                    temp_kernel_size=tks[bi],
                    stride=c.spatial_strides[si] if bi == 0 else 1,
                    name=f"s{si + 2}/pathway0_res{bi}",
                    **common,
                )(x, train)
            if si == 0 and c.t_pool_after_s2 > 1 and c.stop_point > 3:
                # stop_point==3 replaces pathway0_pool with Identity in the
                # reference (:320) — its head table expects time_size=32
                x = max_pool_3d(
                    x, (c.t_pool_after_s2, 1, 1), (c.t_pool_after_s2, 1, 1),
                    [(0, 0), (0, 0), (0, 0)],
                )

        T_, H_, W_ = x.shape[1], x.shape[2], x.shape[3]
        token_counts = {
            "time": T_, "random": T_, "random_avg": T_,
            "spatial": H_ * W_, "all": T_ * H_ * W_,
        }
        if self.patch_type not in token_counts:
            raise NotImplementedError(
                f"patch_type={self.patch_type!r}; one of {sorted(token_counts)}"
            )
        n_tokens = token_counts[self.patch_type]
        x = TimeTransformerHead(
            num_patches=n_tokens,
            dim=x.shape[-1],
            num_classes=c.num_classes,
            patch_type=self.patch_type,
            random_select=self.random_select,
            k=self.patch_k,
            dtype=self.dtype,
            name="head",
        )(x, train)
        return x
