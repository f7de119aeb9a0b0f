"""Video transformer variants from the reference ViT zoo.

Rebuild of ``model/classifier/time_transformer.py``: the shared pre-norm
encoder (``Attention`` :36 / ``Transformer`` :74), ``VideoiT`` (:167 — each
spatial patch becomes an independent time-series classified by a
TimeTransformer, with train-time RandomSelect :146 over interior patches)
and ``SpatialTemporal_Transformer`` (:281 — ViViT-style factorized
space-then-time attention with per-frame spatial cls tokens feeding a
temporal transformer). The cls-token TimeTransformer itself lives in
``models/ftcn.py`` (TimeTransformerHead) where the shipped config uses it.

TPU notes: static shapes throughout — RandomSelect draws a fixed-k subset
via ``jax.random.choice`` on the ``patch`` PRNG stream; patch extraction is
a reshape/transpose chain XLA fuses into the embedding matmul (MXU-friendly:
one [B·N, patch_dim]×[patch_dim, dim] GEMM instead of im2col convs).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class TransformerEncoder(nn.Module):
    """Pre-norm ViT encoder (reference Transformer, time_transformer.py:74)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        inner = self.heads * self.dim_head
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"attn_norm{i}")(x)
            qkv = nn.Dense(inner * 3, use_bias=False, name=f"qkv{i}")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def split_heads(t):
                return t.reshape(B, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

            q, k, v = map(split_heads, (q, k, v))
            att = jax.nn.softmax(
                jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5, axis=-1
            )
            o = jnp.einsum("bhij,bhjd->bhid", att, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, -1, inner)
            o = nn.Dense(self.dim, name=f"attn_out{i}")(o)
            x = x + nn.Dropout(self.dropout, deterministic=not train)(o)
            h = nn.LayerNorm(name=f"mlp_norm{i}")(x)
            h = nn.gelu(nn.Dense(self.mlp_dim, name=f"mlp_fc1_{i}")(h))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.Dense(self.dim, name=f"mlp_fc2_{i}")(h)
            x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        return x


def extract_patches(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, T, H, W, C] → [B, T, (H/p)(W/p), p·p·C] (the Rearrange at
    time_transformer.py:174/:294, channels-last)."""
    B, T, H, W, C = x.shape
    x = x.reshape(B, T, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, T, (H // p) * (W // p), p * p * C)


def interior_patch_indices(n: int) -> jnp.ndarray:
    """Interior patch ids for RandomSelect (reference valid_idx at
    time_transformer.py:134: a ``pad = h // 7``-wide border is excluded,
    with the quirk that both coordinates divide by h — NOT the 1-wide
    variant in i3d_temporal_var_fix_dropout_tt_cfg.py:97, which the FTCN
    head replicates separately in models/ftcn.py). For grids smaller than
    7x7, pad = 0 and every patch is valid."""
    h = int(n ** 0.5)
    pad = h // 7
    idx = [i for i in range(n)
           if not (i % h < pad or i // h >= h - pad or i % h >= h - pad)]
    return jnp.asarray(idx, jnp.int32)


class VideoiT(nn.Module):
    """Per-patch time transformer (reference VideoiT, time_transformer.py:167):
    every (randomly selected interior) spatial patch is a T-step sequence
    classified independently; output [B, n_selected·num_classes]."""

    image_size: int
    patch_size: int
    num_frames: int
    num_classes: int = 1
    dim: int = 256
    depth: int = 2
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1024
    dropout: float = 0.0
    emb_dropout: float = 0.0
    pool: str = "cls"
    random_select: bool = False
    k: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.image_size % self.patch_size == 0
        B = x.shape[0]
        patches = extract_patches(x, self.patch_size)       # [B,T,N,pd]
        patches = patches.transpose(0, 2, 1, 3)             # [B,N,T,pd]
        interior = interior_patch_indices(patches.shape[1])
        if train and self.random_select:                    # RandomSelect :146
            sel = jax.random.choice(
                self.make_rng("patch"), interior, (self.k,), replace=False
            )
        else:
            sel = interior
        patches = patches[:, sel]                           # [B,n,T,pd]
        n = patches.shape[1]
        seq = patches.reshape(B * n, self.num_frames, -1)
        seq = nn.Dense(self.dim, name="patch_to_embedding")(seq)

        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, self.num_frames + 1, self.dim),
        )
        seq = jnp.concatenate([jnp.tile(cls, (B * n, 1, 1)), seq], axis=1) + pos
        seq = nn.Dropout(self.emb_dropout, deterministic=not train)(seq)
        seq = TransformerEncoder(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, name="transformer",
        )(seq, train)
        feat = seq.mean(axis=1) if self.pool == "mean" else seq[:, 0]
        out = nn.Dense(self.num_classes, name="mlp_head")(nn.LayerNorm(name="head_norm")(feat))
        return out.reshape(B, -1)                           # ref :214


class SpatialTemporalTransformer(nn.Module):
    """Factorized space→time ViT (reference SpatialTemporal_Transformer,
    time_transformer.py:281): per-frame spatial encoder with a space cls
    token, frame cls tokens feed a temporal encoder with its own cls token.

    Deviation: the reference's patch embedding Linear is commented out (the
    patch dim must accidentally equal ``dim``); here the projection is
    explicit so any patch size works."""

    image_size: int
    patch_size: int
    num_frames: int
    num_classes: int = 1
    dim: int = 192
    depth: int = 4
    heads: int = 3
    dim_head: int = 64
    scale_dim: int = 4
    dropout: float = 0.0
    emb_dropout: float = 0.0
    pool: str = "cls"

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.image_size % self.patch_size == 0
        B, T = x.shape[:2]
        patches = extract_patches(x, self.patch_size)       # [B,T,N,pd]
        patches = nn.Dense(self.dim, name="patch_to_embedding")(patches)
        N = patches.shape[2]

        space_tok = self.param("space_token", nn.initializers.normal(1.0),
                               (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_frames, N + 1, self.dim))
        x = jnp.concatenate(
            [jnp.tile(space_tok, (B, T, 1, 1))[:, :, :1], patches], axis=2
        ) + pos[:, :T, : N + 1]
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        x = x.reshape(B * T, N + 1, self.dim)
        x = TransformerEncoder(
            self.dim, self.depth, self.heads, self.dim_head,
            self.dim * self.scale_dim, self.dropout, name="space_transformer",
        )(x, train)
        x = x[:, 0].reshape(B, T, self.dim)                 # frame cls tokens

        temp_tok = self.param("temporal_token", nn.initializers.normal(1.0),
                              (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(temp_tok, (B, 1, 1)), x], axis=1)
        x = TransformerEncoder(
            self.dim, self.depth, self.heads, self.dim_head,
            self.dim * self.scale_dim, self.dropout, name="temporal_transformer",
        )(x, train)
        feat = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return nn.Dense(self.num_classes, name="mlp_head")(
            nn.LayerNorm(name="head_norm")(feat)
        )
