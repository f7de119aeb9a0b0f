"""Pallas TPU kernel for the batched affine clip warp.

The pure-XLA warp (:func:`stdd_tpu.ops.align.warp_clip_bilinear`) lowers to a
4-tap gather — ~1.1 s for a [8, 32] clip batch on one chip, half the scorer's
device time, because TPU gathers are scalar-ish. This kernel reformulates
bilinear affine warping as dense **matmuls on the MXU**:

For output row r of frame n, source coords are linear in the column c:
    x_s(c) = m00·c + (m01·r + m02)
    y_s(c) = m10·c + (m11·r + m12)
Bilinear interpolation along x is a 2-sparse matrix  Wx[c, j] =
relu(1 − |x_s(c) − j|); applying it to a BAND of source rows around
min y_s is one [BAND, W] × [W, S] matmul, and the y-interpolation is a
weighted sum over the band. Rotation bounds the band: BAND ≥ |m10|·S + 10 (slice starts must be
8-aligned). Faces in video calls are near-upright; BAND=32 covers
|rotation| ≲ 5.6° across 224 px; the caller falls back to the XLA gather outside that envelope
(checked per batch on host — see :func:`warp_clip_auto`).

Border semantics match cv2 BORDER_CONSTANT(0): out-of-range taps get zero
weight in both axes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BAND = 32  # multiple of 8; y_lo is 8-aligned, so usable drift ≈ BAND−10 rows


def _warp_kernel(params_ref, crop_ref, out_ref, *, out_size: int, band: int):
    """One grid step = one frame. Planar layout ([1, 3, H, W] crop block,
    [1, 3, S, S] out block) so the 128-lane dim is the image width — with
    channels last, C=3 on the lane dim pads VMEM tiles 42×.
    params_ref (scalar prefetch, SMEM): per-frame dst→src affine
    m00, m01, m02, m10, m11, m12, pad, pad."""
    _, _, H, W = crop_ref.shape
    S = out_size
    n = pl.program_id(0)
    m00 = params_ref[n, 0]
    m01 = params_ref[n, 1]
    m02 = params_ref[n, 2]
    m10 = params_ref[n, 3]
    m11 = params_ref[n, 4]
    m12 = params_ref[n, 5]

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0].astype(jnp.float32)
    j_in = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)[0].astype(jnp.float32)
    b_off = jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0).astype(jnp.float32)

    def row_body(r, _):
        rf = r.astype(jnp.float32)
        x_s = m00 * cols + (m01 * rf + m02)                              # [S]
        y_s = m10 * cols + (m11 * rf + m12)                              # [S]

        # band start: floor(min y_s) − 1, aligned DOWN to a multiple of 8
        # (Mosaic requires 8-aligned sublane slice starts), clamped in range
        y_lo = jnp.floor(jnp.min(y_s)) - 1.0
        y_lo = jnp.clip(y_lo, 0.0, float(H - band)).astype(jnp.int32)
        y_lo = pl.multiple_of((y_lo // 8) * 8, 8)

        # x interpolation matrix [S, W]: 2-sparse hat weights, zero outside
        dx = jnp.abs(x_s[:, None] - j_in[None, :])
        Wx = jnp.maximum(0.0, 1.0 - dx)
        # out-of-image x taps → weight 0 happens naturally (|x_s−j| ≥ 1 for
        # all in-range j when x_s is outside [−1, W]); clip extreme coords so
        # the hat function can't alias back in
        Wx = jnp.where((x_s[:, None] < -0.999) | (x_s[:, None] > W - 0.001), 0.0, Wx)

        # y weights over the band [band, S]
        y_rows = y_lo.astype(jnp.float32) + b_off                        # [band,1]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_s[None, :] - y_rows))      # [band,S]
        wy = jnp.where((y_s[None, :] < -0.999) | (y_s[None, :] > H - 0.001), 0.0, wy)

        for ch in range(3):
            band_rows = crop_ref[0, ch, pl.ds(y_lo, band), :]            # [band, W]
            M = jnp.dot(band_rows, Wx.T, preferred_element_type=jnp.float32)
            out_ref[0, ch, r, :] = jnp.sum(wy * M, axis=0)
        return 0

    jax.lax.fori_loop(0, S, row_body, 0)


# pl import kept local-name for kernel body
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


@functools.partial(jax.jit, static_argnames=("out_size", "band", "interpret"))
def warp_clip_pallas(
    crops: jnp.ndarray,     # [N, H, W, 3] uint8/float
    params: jnp.ndarray,    # [N, 8] f32 (m00 m01 m02 m10 m11 m12, pad, pad)
    out_size: int = 224,
    band: int = BAND,
    interpret: bool = False,
) -> jnp.ndarray:
    N, H, W, C = crops.shape
    planar = crops.astype(jnp.float32).transpose(0, 3, 1, 2)  # [N, 3, H, W]
    # pad H to a multiple of 8 and at least `band`: the kernel clamps the
    # band start to [0, H-band] then aligns DOWN to a multiple of 8 (Mosaic
    # sublane-slice requirement) — with 8-aligned H the clamp bound stays
    # aligned, so the band always reaches the bottom row (a non-aligned H
    # silently dropped up to H%8 bottom rows; H<band made the clamp bound
    # negative). Zero rows are exactly the gather path's zero canvas.
    assert band % 8 == 0, band
    H_pad = max(-(-H // 8) * 8, band)
    if H_pad != H:
        planar = jnp.pad(planar, ((0, 0), (0, 0), (0, H_pad - H), (0, 0)))
        H = H_pad
    kernel = functools.partial(_warp_kernel, out_size=out_size, band=band)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,     # params land in SMEM, fully visible
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda n, *_: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, out_size, out_size), lambda n, *_: (n, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, C, out_size, out_size), jnp.float32),
        interpret=interpret,
    )(params, planar)
    return out.transpose(0, 2, 3, 1)


def pack_warp_params(
    tfm: jnp.ndarray,       # [2, 3] forward cv2-convention affine (canvas→out)
    diffs: jnp.ndarray,     # [T, 2] crop offsets inside the canvas
) -> jnp.ndarray:
    """Per-frame dst→src affine in crop-local coords: src = A⁻¹ p − d_t."""
    from .align import invert_affine_2x3

    Minv = invert_affine_2x3(tfm)
    T = diffs.shape[0]
    base = jnp.concatenate([Minv[0], Minv[1]])  # m00 m01 m02 m10 m11 m12
    params = jnp.tile(base, (T, 1))
    params = params.at[:, 2].add(-diffs[:, 0].astype(jnp.float32))
    params = params.at[:, 5].add(-diffs[:, 1].astype(jnp.float32))
    return jnp.concatenate([params, jnp.zeros((T, 2), jnp.float32)], axis=1)


def rotation_fits_band(tfm_batch: np.ndarray, out_size: int, band: int = BAND) -> bool:
    """Host-side envelope check: the band covers the row-wise y drift when
    |m10|·S + 3 ≤ band for every transform in the batch."""
    m = np.asarray(tfm_batch)
    from .align import invert_affine_2x3

    drift = []
    for t in m.reshape(-1, 2, 3):
        minv = np.asarray(invert_affine_2x3(jnp.asarray(t)))
        drift.append(abs(minv[1, 0]) * out_size + 3)
    # 8-alignment of the band start costs up to 7 rows of coverage
    return bool(np.max(drift) + 7 <= band)
