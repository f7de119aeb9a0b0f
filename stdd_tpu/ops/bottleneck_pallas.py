"""Fused residual-bottleneck Pallas kernel for the I3D s2 stage.

Why: at the production shape (B8 × T32 × 56² × 64/256ch) the s2 stage is
HBM-bandwidth-bound, not FLOP-bound — each bottleneck's a/b/c convs and the
residual add round-trip ~1.5-2.5 GB of activations through HBM for only
~0.1 TFLOP of work (reference math: resnet_helper.py:196 BottleneckTransform
+ :329 ResBlock). XLA fuses the elementwise epilogues but never conv→conv,
so the 64-channel intermediates (which also pad to 128 lanes in HBM) are
materialized twice each.

This kernel computes one WHOLE bottleneck — temporal a (tk×1×1) → spatial b
(1×3×3) → pointwise c (1×1×1), each with eval-folded BN + ReLU, plus the
residual add (identity or projection shortcut) and final ReLU — per VMEM
tile. The a/b intermediates never touch HBM; the input tile is read once
(plus ~40% halo re-reads) and the output written once.

Halos: the kernel tiles (T, H) and needs a 1-element halo in each (a's
temporal taps, b's spatial taps). Rather than manual DMA, the SAME input
array is passed nine times with different BlockSpecs — center block, 4 edge
strips, 4 corner strips — with clamped index maps; clamped (duplicate) loads
at sequence/image boundaries are masked to zero in-kernel, which is exactly
the conv zero padding. Pallas pipelines all nine streams automatically.

Eval-only (BN folded — training still runs the XLA path). Matmuls accumulate
in f32 (`preferred_element_type`), intermediates are bf16.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(w, scale, bias, mean, var, eps: float):
    """Fold eval-BatchNorm into conv weights: returns (w', b') with
    ``conv(x, w') + b' == BN(conv(x, w))`` at eval time (float32 math)."""
    inv = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    wf = w.astype(jnp.float32) * inv          # broadcast over trailing F
    bf = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    return wf, bf


def _kernel(xc, xtm, xtp, xhm, xhp, ctm_hm, ctm_hp, ctp_hm, ctp_hp,
            wa, ba, wb, bb, wc, bc, ws, bs, out, xf_ref,
            *, tk: int, project: bool, dtype):
    it = pl.program_id(1)
    ih = pl.program_id(2)
    nt = pl.num_programs(1)
    nh = pl.num_programs(2)
    Tt, Ht, W, Cin = xc.shape[1], xc.shape[2], xc.shape[3], xc.shape[4]
    Ci = wb.shape[-1]
    Co = wc.shape[-1]

    x0 = xc[0]                                   # [Tt, Ht, W, Cin]

    def masked(ref, cond):
        v = ref[0]
        return jnp.where(cond, v, jnp.zeros_like(v))

    t_lo = it > 0
    t_hi = it < nt - 1
    h_lo = ih > 0
    h_hi = ih < nh - 1

    # assemble the haloed tile with direct region stores; clamped duplicate
    # blocks at boundaries are masked to zero = the conv zero padding
    off = 1 if tk > 1 else 0
    xf_ref[off:off + Tt, 1:Ht + 1] = x0
    xf_ref[off:off + Tt, 0:1] = masked(xhm, h_lo)
    xf_ref[off:off + Tt, Ht + 1:Ht + 2] = masked(xhp, h_hi)
    if tk > 1:
        xf_ref[0:1, 1:Ht + 1] = masked(xtm, t_lo)
        xf_ref[Tt + 1:Tt + 2, 1:Ht + 1] = masked(xtp, t_hi)
        xf_ref[0:1, 0:1] = masked(ctm_hm, t_lo & h_lo)
        xf_ref[0:1, Ht + 1:Ht + 2] = masked(ctm_hp, t_lo & h_hi)
        xf_ref[Tt + 1:Tt + 2, 0:1] = masked(ctp_hm, t_hi & h_lo)
        xf_ref[Tt + 1:Tt + 2, Ht + 1:Ht + 2] = masked(ctp_hp, t_hi & h_hi)

    # invalid (out-of-image) H-halo rows of xa must be ZERO for b's zero
    # padding — a's bias would otherwise leak through the zeroed input
    row = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, 1, 1), 0)
    valid = ((row > 0) | h_lo) & ((row < Ht + 1) | h_hi)

    # per-frame processing: b (spatial) and c (pointwise) do not mix T, so
    # looping t keeps the f32 accumulators at one frame's footprint (the
    # whole-tile version blows the VMEM budget at Cin=256). The loop is a
    # STATIC unroll with static scratch slices — Mosaic crashed on the
    # fori_loop + dynamically-sliced-ref formulation of the same math.
    Ma = (Ht + 2) * W
    Mb = Ht * W
    zcol = jnp.zeros((Ht, 1, Ci), dtype)
    wcv = wc[...]
    wsv = ws[...] if project else None

    for t in range(Tt):
        # -- a: temporal tk×1×1 over the haloed rows ----------------------
        acc = None
        for dt in range(tk):
            xs = xf_ref[t + dt]
            p = jax.lax.dot_general(
                xs.reshape(Ma, Cin), wa[dt], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        xa = jnp.maximum(acc + ba[0], 0.0).astype(dtype)
        xa = jnp.where(valid, xa.reshape(Ht + 2, W, Ci), 0)

        # -- b: spatial 1×3×3; W edges zero-shifted -----------------------
        accb = None
        for dy in range(3):
            rows = xa[dy:dy + Ht]                 # [Ht, W, Ci]
            for dx in range(3):
                if dx == 0:
                    shifted = jnp.concatenate([zcol, rows[:, :-1]], axis=1)
                elif dx == 2:
                    shifted = jnp.concatenate([rows[:, 1:], zcol], axis=1)
                else:
                    shifted = rows
                p = jax.lax.dot_general(
                    shifted.reshape(Mb, Ci), wb[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                accb = p if accb is None else accb + p
        xb = jnp.maximum(accb + bb[0], 0.0).astype(dtype)

        # -- c + residual + final relu ------------------------------------
        yc = jax.lax.dot_general(
            xb, wcv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x0t = x0[t]
        if project:
            res = jax.lax.dot_general(
                x0t.reshape(Mb, Cin), wsv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bs[0]
        else:
            res = x0t.reshape(Mb, Co).astype(jnp.float32)
        y = jnp.maximum(yc + bc[0] + res, 0.0).astype(dtype)
        out[0, t] = y.reshape(Ht, W, Co)


@functools.partial(
    jax.jit,
    static_argnames=("tk", "tile_t", "tile_h", "interpret", "out_dtype"))
def fused_bottleneck(
    x,                      # [B, T, H, W, Cin]
    wa, ba,                 # [tk, Cin, Ci], [Ci]   (BN folded)
    wb, bb,                 # [3, 3, Ci, Ci], [Ci]
    wc, bc,                 # [Ci, Co], [Co]
    ws=None, bs=None,       # [Cin, Co], [Co] — projection shortcut (else identity)
    *, tk: int = 3, tile_t: int = 8, tile_h: int = 14,
    interpret: bool = False, out_dtype=jnp.bfloat16,
):
    """relu(shortcut(x) + c(relu(b(relu(a(x)))))) — one fused device pass.

    Stride-1 bottleneck (the s2 shape). T % tile_t == 0 and H % tile_h == 0
    required (production: T=32, H=56 → 8/14 divide exactly).
    """
    B, T, H, W, Cin = x.shape
    Ci = wb.shape[-1]
    Co = wc.shape[-1]
    project = ws is not None
    assert T % tile_t == 0 and H % tile_h == 0, (T, H, tile_t, tile_h)
    nt, nh = T // tile_t, H // tile_h
    Tt, Ht = tile_t, tile_h

    x = x.astype(out_dtype)
    f32 = jnp.float32
    wa = wa.astype(out_dtype)
    wb = wb.astype(out_dtype)
    wc = wc.astype(out_dtype)
    # biases as [1, C] (TPU wants ≥2D); kept f32 for exact folding math
    ba2 = ba.astype(f32).reshape(1, Ci)
    bb2 = bb.astype(f32).reshape(1, Ci)
    bc2 = bc.astype(f32).reshape(1, Co)
    if project:
        ws = ws.astype(out_dtype)
        bs2 = bs.astype(f32).reshape(1, Co)
    else:
        assert Cin == Co, (Cin, Co)
        ws = jnp.zeros((1, 1), out_dtype)
        bs2 = jnp.zeros((1, 1), f32)

    def im(*blk):
        def f(b, it, ih):
            return tuple(v(b, it, ih) if callable(v) else v for v in blk)
        return f

    xspec = lambda bt, bh, t_idx, h_idx: pl.BlockSpec(  # noqa: E731
        (1, bt, bh, W, Cin),
        im(lambda b, it, ih: b, t_idx, h_idx, 0, 0),
    )
    tc = lambda b, it, ih: it            # noqa: E731 — center indices
    hc = lambda b, it, ih: ih            # noqa: E731
    tm = lambda b, it, ih: jnp.maximum(it * Tt - 1, 0)          # noqa: E731
    tp = lambda b, it, ih: jnp.minimum(it * Tt + Tt, T - 1)     # noqa: E731
    hm = lambda b, it, ih: jnp.maximum(ih * Ht - 1, 0)          # noqa: E731
    hp = lambda b, it, ih: jnp.minimum(ih * Ht + Ht, H - 1)     # noqa: E731

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, it, ih: (0,) * nd)

    in_specs = [
        xspec(Tt, Ht, tc, hc),           # center (block units in T/H)
        xspec(1, Ht, tm, hc),            # T-minus row (element index in T)
        xspec(1, Ht, tp, hc),
        xspec(Tt, 1, tc, hm),            # H-minus strip (element index in H)
        xspec(Tt, 1, tc, hp),
        xspec(1, 1, tm, hm),             # corners
        xspec(1, 1, tm, hp),
        xspec(1, 1, tp, hm),
        xspec(1, 1, tp, hp),
        wspec(wa.shape), wspec(ba2.shape),
        wspec(wb.shape), wspec(bb2.shape),
        wspec(wc.shape), wspec(bc2.shape),
        wspec(ws.shape), wspec(bs2.shape),
    ]
    out_spec = pl.BlockSpec(
        (1, Tt, Ht, W, Co), im(lambda b, it, ih: b, tc, hc, 0, 0))

    kern = functools.partial(_kernel, tk=tk, project=project, dtype=out_dtype)
    xf_t = Tt + (2 if tk > 1 else 0)
    return pl.pallas_call(
        kern,
        grid=(B, nt, nh),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, Co), out_dtype),
        scratch_shapes=[pltpu.VMEM((xf_t, Ht + 2, W, Cin), out_dtype)],
        interpret=interpret,
    )(x, x, x, x, x, x, x, x, x,
      wa, ba2, wb, bb2, wc, bc2, ws, bs2)


def bottleneck_reference(x, wa, ba, wb, bb, wc, bc, ws=None, bs=None,
                         tk: int = 3):
    """Plain-XLA oracle of the same math (conv3d formulation)."""
    f32 = jnp.float32
    x = x.astype(f32)
    dn = ("NDHWC", "DHWIO", "NDHWC")
    a = jax.lax.conv_general_dilated(
        x, wa.astype(f32).reshape(tk, 1, 1, *wa.shape[1:]),
        (1, 1, 1), [(tk // 2, tk // 2), (0, 0), (0, 0)],
        dimension_numbers=dn) + ba
    a = jnp.maximum(a, 0.0)
    b = jax.lax.conv_general_dilated(
        a, wb.astype(f32).reshape(1, 3, 3, *wb.shape[2:]),
        (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=dn) + bb
    b = jnp.maximum(b, 0.0)
    c = jax.lax.conv_general_dilated(
        b, wc.astype(f32).reshape(1, 1, 1, *wc.shape),
        (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
        dimension_numbers=dn) + bc
    if ws is not None:
        res = jax.lax.conv_general_dilated(
            x, ws.astype(f32).reshape(1, 1, 1, *ws.shape),
            (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=dn) + bs
    else:
        res = x
    return jnp.maximum(c + res, 0.0)
