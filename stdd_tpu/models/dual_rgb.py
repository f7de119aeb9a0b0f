"""Tri-modal RGB fusion models (the reference's dualrun/rgb extension).

- :class:`DualEncoderRGB` (ref ``dualrun/model/dual_rgb.py:47``): trainable
  AU + LMK branch encoders plus a FROZEN AltFreezing RGB embedding
  (masked-mean pooled, ``AltFreezingRGBEncoder`` at ``:9``), concatenated
  into one head over 3·d_model. The RGB branch consumes either precomputed
  per-clip features [B, T, D] (``from_features=True`` — produced by the
  feature dumper) or pixel clips through a frozen I3D.
- :class:`GatedMoE` (ref ``dualrun/rgb/engine_rgb.py:369``): late fusion of
  the two per-video logits with a learned gate and per-expert temperatures.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .dual_encoder import BranchEncoder, lengths_to_mask


def masked_mean(z: jnp.ndarray, pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over time honoring True=PAD masks (dual_rgb.py:36-44)."""
    if pad_mask is None:
        return jnp.mean(z, axis=1)
    valid = (~pad_mask).astype(jnp.float32)
    w = valid / jnp.maximum(valid.sum(axis=1, keepdims=True), 1e-6)
    return jnp.einsum("bt,btd->bd", w, z)


class DualEncoderRGB(nn.Module):
    au_dim: int = 36
    lmk_dim: int = 132
    vis_dim: int = 2048            # AltFreezing penultimate width
    d_model: int = 256
    depth: int = 4
    heads: int = 4
    mlp_ratio: float = 2.0
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        A,                         # [B, T, au_dim]
        L,                         # [B, T, lmk_dim]
        rgb_feats,                 # [B, T, vis_dim] frozen per-clip features
        lengths=None,
        train: bool = False,
    ) -> Dict[str, Any]:
        pad = lengths_to_mask(lengths, A.shape[1]) if lengths is not None else None
        za = BranchEncoder(
            self.au_dim, self.d_model, self.depth, self.heads, self.mlp_ratio,
            self.dropout, name="au_enc",
        )(A, pad_mask=pad, train=train)
        zl = BranchEncoder(
            self.lmk_dim, self.d_model, self.depth, self.heads, self.mlp_ratio,
            self.dropout, name="lmk_enc",
        )(L, pad_mask=pad, train=train)
        # frozen RGB branch: stop_gradient == requires_grad=False
        zv = masked_mean(jax.lax.stop_gradient(rgb_feats.astype(jnp.float32)), pad)
        zv = nn.Dense(self.d_model, use_bias=False, name="rgb_proj")(zv)
        zv = jax.lax.stop_gradient(zv)  # rgb_proj frozen too (dual_rgb.py:70)

        z = jnp.concatenate([za, zl, zv], axis=-1)
        h = nn.LayerNorm(name="head_ln")(z)
        h = nn.gelu(nn.Dense(2 * self.d_model, name="head_fc1")(h), approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        logits = nn.Dense(1, name="head_fc2")(h)[:, 0]
        return {"bin_logits": logits, "z": z}


class GatedMoE(nn.Module):
    """Gated late fusion of (RGB logit, dual logit) per video
    (engine_rgb.py:369): p = g·σ(z_rgb/t_rgb) + (1−g)·σ(z_dual/t_dual),
    returned in logit space together with the gate."""

    hidden: int = 8

    @nn.compact
    def __call__(self, z_rgb: jnp.ndarray, z_dual: jnp.ndarray):
        t_rgb = self.param("t_rgb", nn.initializers.ones, ())
        t_dual = self.param("t_dual", nn.initializers.ones, ())
        x = jnp.concatenate([z_rgb, z_dual, jnp.abs(z_rgb - z_dual)], axis=1)
        g = nn.Dense(self.hidden, name="gate_fc1")(x)
        g = nn.relu(g)
        g = jax.nn.sigmoid(nn.Dense(1, name="gate_fc2")(g))
        p = g * jax.nn.sigmoid(z_rgb / jnp.maximum(t_rgb, 1.0)) + (1 - g) * jax.nn.sigmoid(
            z_dual / jnp.maximum(t_dual, 0.1)
        )
        eps = 1e-6
        z = jnp.log((p + eps) / (1 - p + eps))
        return z, g
