"""Dual-branch AU+LMK transformer detector (the "dualrun" second detector).

Rebuild of the reference ``dualrun/model/dual_encoder.py``:

- :class:`BranchEncoder` (ref ``:53``): Linear proj → LayerNorm → Δ +
  high-pass(MA-5) temporal mix (``:77-87``) → dilated depthwise Conv1d
  pyramid d=1,2,4 + residual → pointwise conv + GELU → sinusoidal PE →
  pre-norm TransformerEncoder → attention pooling (``:29``) with temperature.
- :class:`DualEncoderAU_LMK` (ref ``:110``): two branches, concat →
  LN/MLP head → 1 logit; optional gradient-reversal domain head (DAT,
  ``GradReverse`` at ``:8``); aux heads ``au_from_lmk``/``proj_au``/
  ``proj_lmk`` (``:129-131``).

Masking semantics (True = PAD), including the all-pad token-0 unlock
(``:168-172``), match the reference exactly.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


# --- gradient reversal (DAT) — reference GradReverse (dual_encoder.py:8) ----

@jax.custom_vjp
def grad_reverse(x, lam):
    return x


def _gr_fwd(x, lam):
    return x, lam


def _gr_bwd(lam, g):
    return (-lam * g, None)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


def sinusoidal_pe(T: int, d_model: int) -> jnp.ndarray:
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((T, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def lengths_to_mask(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """[B] int lengths or [B,T] validity (1=valid) → [B,T] bool, True = PAD.

    Empty rows keep token 0 valid — the reference's ``lengths.clamp_min(1)``
    (dual_encoder.py:48): an all-PAD row would otherwise degrade attention
    and AttentionPooling to a uniform average over garbage tokens. Applied
    HERE so every consumer (DualEncoderAU_LMK, LMKDisc, DualEncoderRGB)
    shares the semantics, not just the model that adds its own unlock."""
    if lengths.ndim == 2:
        pad = lengths == 0
        all_pad = pad.all(axis=1)
        return pad.at[:, 0].set(jnp.where(all_pad, False, pad[:, 0]))
    ar = jnp.arange(T)[None, :]
    return ar >= jnp.maximum(lengths, 1)[:, None]


class AttentionPooling(nn.Module):
    """Soft attention pooling with learned query and temperature (ref :29)."""

    d_model: int
    tau: float = 1.0

    @nn.compact
    def __call__(self, x, pad_mask=None):
        v = self.param("v", nn.initializers.normal(1.0), (self.d_model,))
        scores = (x @ v) / max(self.tau, 1e-3)
        if pad_mask is not None:
            scores = jnp.where(pad_mask, jnp.finfo(scores.dtype).min, scores)
        w = jax.nn.softmax(scores, axis=1)
        return jnp.einsum("bt,btd->bd", w, x), w


class TransformerLayer(nn.Module):
    """Pre-norm encoder layer matching torch TransformerEncoderLayer
    (norm_first=True, GELU FF, attention key-padding mask)."""

    d_model: int
    heads: int
    ff_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, pad_mask=None, train: bool = False):
        B, T, D = x.shape
        h = nn.LayerNorm(name="norm1")(x)
        attn_mask = None
        if pad_mask is not None:
            # True=PAD → disallowed keys
            attn_mask = ~pad_mask[:, None, None, :]  # [B,1,1,T] True=keep
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="self_attn",
        )(h, h, mask=attn_mask)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(a)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.gelu(nn.Dense(self.ff_dim, name="linear1")(h), approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, name="linear2")(h)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        return x


class BranchEncoder(nn.Module):
    input_dim: int
    d_model: int = 256
    depth: int = 4
    heads: int = 4
    mlp_ratio: float = 2.0
    dropout: float = 0.1
    pool_tau: float = 0.7

    @nn.compact
    def __call__(
        self,
        x,
        pad_mask=None,
        train: bool = False,
        return_weights: bool = False,
        return_seq: bool = False,
    ):
        h = nn.LayerNorm(name="ln_in")(nn.Dense(self.d_model, name="proj")(x))

        # first-order Δ (zeros prepended)
        delta = jnp.concatenate(
            [jnp.zeros_like(h[:, :1]), h[:, 1:] - h[:, :-1]], axis=1
        )
        # high-pass vs 5-tap moving average (torch avg_pool1d pad=2,
        # count_include_pad=True → always /5 with zero padding)
        hp = jnp.pad(h, ((0, 0), (2, 2), (0, 0)))
        ma = (
            hp[:, :-4] + hp[:, 1:-3] + hp[:, 2:-2] + hp[:, 3:-1] + hp[:, 4:]
        ) / 5.0
        h = h + 0.5 * delta + 0.5 * (h - ma)

        # dilated depthwise pyramid + residual, then pointwise GELU
        pyr = 0.0
        for i, dil in enumerate((1, 2, 4)):
            pyr = pyr + nn.Conv(
                features=self.d_model,
                kernel_size=(3,),
                padding=[(dil, dil)],
                kernel_dilation=(dil,),
                feature_group_count=self.d_model,
                name=f"temporal{i}",
            )(h)
        h = pyr + h
        h = nn.gelu(nn.Conv(self.d_model, kernel_size=(1,), name="pointwise")(h), approximate=False)

        h = h + sinusoidal_pe(h.shape[1], self.d_model)[None]
        for i in range(self.depth):
            h = TransformerLayer(
                d_model=self.d_model,
                heads=self.heads,
                ff_dim=int(self.d_model * self.mlp_ratio),
                dropout=self.dropout,
                name=f"layer{i}",
            )(h, pad_mask=pad_mask, train=train)

        clip, w = AttentionPooling(self.d_model, tau=self.pool_tau, name="pool")(
            h, pad_mask
        )
        out = [clip]
        if return_weights:
            out.append(w)
        if return_seq:
            out.append(h)
        return tuple(out) if len(out) > 1 else clip


class DualEncoderAU_LMK(nn.Module):
    au_dim: int = 36
    lmk_dim: int = 132
    d_model: int = 256
    depth: int = 4
    heads: int = 4
    mlp_ratio: float = 2.0
    dropout: float = 0.1
    proj_dim: int = 128
    use_dat: bool = False
    domain_classes: int = 0
    pool_tau: float = 1.0

    @nn.compact
    def __call__(
        self,
        A,
        L,
        lengths=None,
        train: bool = False,
        need_aux: bool = False,
        return_z: bool = False,
        return_seq: bool = False,
        dat_lambda: float = 0.0,
        z_override=None,
    ) -> Dict[str, Any]:
        """``z_override``: skip the branch encoders and run only the heads on
        a precomputed fused embedding [B, 2·d_model] (used by the trainer to
        score SLERP-augmented embeddings; engine.py:495-514)."""
        if z_override is not None:
            z = z_override
            pad = None
            za_seq = zl_seq = za_w = zl_w = None
        else:
            B, T, _ = A.shape
            pad = lengths_to_mask(lengths, T) if lengths is not None else None
            if pad is not None:
                # unlock token 0 for all-pad rows (reference :168-172)
                all_pad = jnp.all(pad, axis=1)
                pad = pad.at[:, 0].set(jnp.where(all_pad, False, pad[:, 0]))

            au_enc = BranchEncoder(
                self.au_dim, self.d_model, self.depth, self.heads, self.mlp_ratio,
                self.dropout, self.pool_tau, name="au_enc",
            )
            lmk_enc = BranchEncoder(
                self.lmk_dim, self.d_model, self.depth, self.heads, self.mlp_ratio,
                self.dropout, self.pool_tau, name="lmk_enc",
            )
            za, za_w, za_seq = au_enc(
                A, pad_mask=pad, train=train, return_weights=True, return_seq=True
            )
            zl, zl_w, zl_seq = lmk_enc(
                L, pad_mask=pad, train=train, return_weights=True, return_seq=True
            )
            z = jnp.concatenate([za, zl], axis=-1)

        h = nn.LayerNorm(name="head_ln")(z)
        h = nn.gelu(nn.Dense(2 * self.d_model, name="head_fc1")(h), approximate=False)
        h = nn.Dropout(0.2, deterministic=not train)(h)
        bin_logits = nn.Dense(1, name="head_fc2")(h)[:, 0]

        out: Dict[str, Any] = {"bin_logits": bin_logits, "dom_logits": None}
        if self.use_dat and self.domain_classes > 0:
            # gradient reversal scaled by (possibly traced) dat_lambda; the
            # trainer decides whether the CE term enters the loss
            z_rev = grad_reverse(z, dat_lambda)
            out["dom_logits"] = nn.Dense(self.domain_classes, name="domain_head")(z_rev)
        if return_z:
            out["z"] = z
        if return_seq:
            out["za_seq"] = za_seq
            out["zl_seq"] = zl_seq
            out["weights"] = {"au": za_w, "lmk": zl_w}
        if need_aux:
            h2 = nn.LayerNorm(name="au_from_lmk_ln")(zl_seq)
            out["au_pred"] = nn.Dense(self.au_dim, name="au_from_lmk_fc")(h2)
            out["proj_au"] = nn.Dense(self.proj_dim, name="proj_au")(za_seq)
            out["proj_lmk"] = nn.Dense(self.proj_dim, name="proj_lmk")(zl_seq)
            out["pad_mask"] = pad
        return out


class LMKDisc(nn.Module):
    """Self-supervised landmark discriminator (reference dualrun/train/
    pretrain.py:51): one BranchEncoder + binary head, trained real vs
    time-shuffled on VoxCeleb landmark tracks."""

    lmk_dim: int = 132
    d_model: int = 256
    depth: int = 4
    heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, L, lengths=None, train: bool = False):
        pad = lengths_to_mask(lengths, L.shape[1]) if lengths is not None else None
        z = BranchEncoder(
            self.lmk_dim, self.d_model, self.depth, self.heads,
            dropout=self.dropout, name="enc",
        )(L, pad_mask=pad, train=train)
        h = nn.LayerNorm(name="head_ln")(z)
        return nn.Dense(1, name="head_fc")(h)[:, 0]
