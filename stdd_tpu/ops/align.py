"""Clip-stable similarity-transform face alignment — the core geometric op.

TPU-native rebuild of the reference's ``FasterCropAlignXRay``
(``test_tools/faster_crop_align_xray.py:11``) and its MATLAB-cp2tform port
(``test_tools/warp_for_xray.py:224`` findNonreflectiveSimilarity, ``:337``
findSimilarity, ``:496`` get_similarity_transform_for_cv2).

Semantics (load-bearing for the temporal model): for a whole clip, ONE
similarity transform is estimated from the stacked per-frame 5-point
landmarks against a canonical template, so every frame is warped with the
same matrix — temporally stable crops with no per-frame jitter.

The reference implements this as: paste each frame's crop into a zeroed
union-bounding-box canvas at offset ``d_t``, then ``cv2.warpAffine`` the
canvas. Here the paste+warp collapses into a single fused gather: output
pixel ``p`` of frame ``t`` samples the crop at ``A^{-1} p − d_t`` with
zero padding — no canvas is ever materialized, shapes stay static
([T, Hc, Wc, 3] in, [T, S, S, 3] out), and the whole thing jits.

The reference's reflective solver has an in-place aliasing quirk
(``warp_for_xray.py:404-421``: ``xyR = xy`` negates the caller's array
before the norm comparison); we replicate the resulting selection exactly —
for face geometry it always resolves to the nonreflective solution.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Canonical 5-point template (eyes, nose, mouth corners) for a 256px crop:
# std_points_317 + 30px padding, shifted (−30, −60) — warp_for_xray.py:547-564.
STD_POINTS_256 = np.array(
    [
        [85.82991, 115.7792],
        [169.0532, 114.3381],
        [127.574, 167.0006],
        [90.6964, 204.7014],
        [167.3069, 203.3733],
    ]
) + np.array([[0.0, -30.0]])


def std_points(size: int = 224) -> jnp.ndarray:
    """Template scaled to the output crop size (FasterCropAlignXRay.__init__)."""
    return jnp.asarray(STD_POINTS_256 * (size / 256.0), dtype=jnp.float32)


def _solve_nonreflective(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity ``[sc, ss, tx, ty]`` mapping ``src → dst``
    (4-unknown normal equations; warp_for_xray.py:224).

    Returns the 3x3 row-vector-convention matrix T with [u v 1] @ T = [x y 1].
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    m = src.shape[0]
    x, y = dst[:, 0:1], dst[:, 1:2]
    ones = jnp.ones((m, 1), jnp.float32)
    zeros = jnp.zeros((m, 1), jnp.float32)
    # X r = U with unknown r for the INVERSE map (dst→src), as the reference does
    X = jnp.concatenate(
        [
            jnp.concatenate([x, y, ones, zeros], axis=1),
            jnp.concatenate([y, -x, zeros, ones], axis=1),
        ],
        axis=0,
    )
    U = jnp.concatenate([src[:, 0:1], src[:, 1:2]], axis=0)
    # tiny 4x4 normal equations — cheap and jit-friendly
    A = X.T @ X
    b = X.T @ U
    r = jnp.linalg.solve(A, b).reshape(-1)
    sc, ss, tx, ty = r[0], r[1], r[2], r[3]
    Tinv = jnp.array(
        [[sc, -ss, 0.0], [ss, sc, 0.0], [tx, ty, 1.0]], dtype=jnp.float32
    )
    T = jnp.linalg.inv(Tinv)
    T = T.at[:, 2].set(jnp.array([0.0, 0.0, 1.0], jnp.float32))
    return T


def _tformfwd(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    p = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), pts.dtype)], axis=1)
    return (p @ T)[:, :2]


def find_similarity(
    src: jnp.ndarray, dst: jnp.ndarray, reflective: bool = True
) -> jnp.ndarray:
    """3x3 similarity (row-vector convention) mapping src→dst.

    ``reflective=True`` replicates the reference's findSimilarity selection
    INCLUDING its aliasing quirk: both candidates are scored against the
    x-negated target (warp_for_xray.py:404-421).
    """
    T1 = _solve_nonreflective(src, dst)
    if not reflective:
        return T1
    # candidate 2: fit against x-negated target, then undo the reflection
    dst_neg = dst * jnp.array([-1.0, 1.0], dst.dtype)
    T2r = _solve_nonreflective(src, dst_neg)
    refl = jnp.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], jnp.float32)
    T2 = T2r @ refl
    # the reference compares both against the (mutated) x-negated target
    norm1 = jnp.linalg.norm(_tformfwd(T1, src) - dst_neg)
    norm2 = jnp.linalg.norm(_tformfwd(T2, src) - dst_neg)
    return jnp.where(norm1 <= norm2, T1, T2)


def similarity_cv2(
    src: jnp.ndarray, dst: jnp.ndarray, reflective: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(2x3 cv2.warpAffine-convention matrix, 3x3 row-vector matrix)
    mapping src→dst (warp_for_xray.py:496 get_similarity_transform_for_cv2)."""
    T = find_similarity(src, dst, reflective)
    return T[:, :2].T, T


def invert_affine_2x3(M: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 column-vector-convention affine matrix."""
    A = M[:, :2]
    t = M[:, 2]
    Ainv = jnp.linalg.inv(A)
    return jnp.concatenate([Ainv, (-Ainv @ t)[:, None]], axis=1)


def warp_clip_bilinear(
    crops: jnp.ndarray,       # [T, Hc, Wc, C] zero-padded per-frame crops
    tfm: jnp.ndarray,         # [2, 3] forward affine (canvas → output), cv2 convention
    diffs: jnp.ndarray,       # [T, 2] (x, y) paste offsets of each crop in the canvas
    out_size: int,
    out_dtype=jnp.float32,
    scales: Optional[jnp.ndarray] = None,   # [T] per-frame crop scale factors
) -> jnp.ndarray:
    """Fused paste-into-canvas + warpAffine for a whole clip.

    Equivalent to the reference's process_single loop
    (faster_crop_align_xray.py:77-89) but with no canvas materialization:
    each output pixel bilinearly samples crop ``t`` at ``A^{-1}p − d_t``,
    zero outside (cv2 BORDER_CONSTANT semantics).

    ``scales``: when crop ``t`` is stored pre-scaled by a per-frame uniform
    factor ``s_t`` (the device-ring streaming path packs each frame at its
    own scale), pass the factors and keep ``tfm``/``diffs``/landmarks in
    UNSCALED coordinates — the sample point is then ``s_t (A^{-1}p − d_t)``,
    which is exact (a similarity absorbs a uniform scale)."""
    T, H, W, C = crops.shape
    S = out_size
    Minv = invert_affine_2x3(tfm)  # output px -> canvas coords

    ys = jax.lax.broadcasted_iota(jnp.float32, (S, S), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (S, S), 1)
    src_x = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    src_y = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    if scales is None:
        scales = jnp.ones((T,), jnp.float32)

    def warp_one(crop, d, s):
        cx = (src_x - d[0]) * s
        cy = (src_y - d[1]) * s
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        wx = (cx - x0)[..., None]
        wy = (cy - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        img = crop.astype(jnp.float32)

        def tap(yi, xi):
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
            return jnp.where(valid[..., None], v, 0.0)

        out = (
            tap(y0i, x0i) * (1 - wx) * (1 - wy)
            + tap(y0i, x0i + 1) * wx * (1 - wy)
            + tap(y0i + 1, x0i) * (1 - wx) * wy
            + tap(y0i + 1, x0i + 1) * wx * wy
        )
        return out

    out = jax.vmap(warp_one)(
        crops, diffs.astype(jnp.float32), scales.astype(jnp.float32)
    )
    if out_dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    else:
        out = out.astype(out_dtype)
    return out


def transform_landmarks(lmks: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply the 3x3 row-vector transform to [.., K, 2] landmarks
    (warp_for_xray.py:571)."""
    ones = jnp.ones(lmks.shape[:-1] + (1,), lmks.dtype)
    p = jnp.concatenate([lmks, ones], axis=-1)
    return jnp.einsum("...ki,ij->...kj", p, T)[..., :2]


def align_clip(
    crops: jnp.ndarray,        # [T, Hc, Wc, C] per-frame big-box crops (zero-padded)
    big_boxes: jnp.ndarray,    # [T, 4] absolute (x1, y1, x2, y2) of each crop
    lm5: jnp.ndarray,          # [T, 5, 2] landmarks in crop-local coords
    out_size: int = 224,
    lm68: Optional[jnp.ndarray] = None,   # [T, 68, 2] optional, crop-local
    template: Optional[jnp.ndarray] = None,
    scales: Optional[jnp.ndarray] = None,  # [T] per-frame crop scale factors
):
    """Full FasterCropAlignXRay.__call__ equivalent, jittable.

    With ``scales``, crops are stored pre-scaled per frame while
    ``big_boxes``/``lm5`` stay in unscaled coordinates (see
    :func:`warp_clip_bilinear`).

    Returns ``(aligned [T,S,S,C] float32, lm5_t, lm68_t or None, tfm 2x3)``.
    """
    T = crops.shape[0]
    tpl = template if template is not None else std_points(out_size)

    left_top = jnp.min(big_boxes[:, :2], axis=0)
    diffs = big_boxes[:, :2] - left_top[None, :]          # [T, 2]
    pts = lm5 + diffs[:, None, :]                          # canvas coords
    tgt = jnp.tile(tpl, (T, 1))
    tfm, trans = similarity_cv2(pts.reshape(-1, 2), tgt)

    aligned = warp_clip_bilinear(crops, tfm, diffs, out_size, scales=scales)
    lm5_t = transform_landmarks(pts, trans)
    lm68_t = None
    if lm68 is not None:
        lm68_t = transform_landmarks(lm68 + diffs[:, None, :], trans)
    return aligned, lm5_t, lm68_t, tfm


# -- host-side (numpy/cv2) clip alignment for the dataset writer -------------

def _solve_nonreflective_np(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Numpy port of :func:`_solve_nonreflective` for host-side callers that
    must not touch the accelerator (the preprocess writer aligns thousands
    of clips; a per-clip device round trip through the relay would dominate
    its runtime)."""
    src = src.astype(np.float32)
    dst = dst.astype(np.float32)
    m = src.shape[0]
    x, y = dst[:, 0:1], dst[:, 1:2]
    ones = np.ones((m, 1), np.float32)
    zeros = np.zeros((m, 1), np.float32)
    X = np.concatenate(
        [np.concatenate([x, y, ones, zeros], axis=1),
         np.concatenate([y, -x, zeros, ones], axis=1)], axis=0)
    U = np.concatenate([src[:, 0:1], src[:, 1:2]], axis=0)
    A = X.T @ X
    b = X.T @ U
    sc, ss, tx, ty = np.linalg.solve(A, b).reshape(-1)
    Tinv = np.array([[sc, -ss, 0.0], [ss, sc, 0.0], [tx, ty, 1.0]], np.float32)
    T = np.linalg.inv(Tinv)
    T[:, 2] = [0.0, 0.0, 1.0]
    return T


def find_similarity_np(src: np.ndarray, dst: np.ndarray,
                       reflective: bool = True) -> np.ndarray:
    """Numpy twin of :func:`find_similarity` (same reference quirks)."""
    T1 = _solve_nonreflective_np(src, dst)

    def fwd(T, pts):
        p = np.concatenate([pts, np.ones((pts.shape[0], 1), pts.dtype)], axis=1)
        return (p @ T)[:, :2]

    if not reflective:
        return T1
    dst_neg = dst * np.array([-1.0, 1.0], dst.dtype)
    T2r = _solve_nonreflective_np(src, dst_neg)
    refl = np.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], np.float32)
    T2 = T2r @ refl
    norm1 = np.linalg.norm(fwd(T1, src) - dst_neg)
    norm2 = np.linalg.norm(fwd(T2, src) - dst_neg)
    return T1 if norm1 <= norm2 else T2


def align_clip_host(
    crops,                      # sequence of [h_i, w_i, 3] uint8 big-box crops
    big_boxes: np.ndarray,      # [T, 4] absolute (x1, y1, x2, y2)
    lm5_local: np.ndarray,      # [T, 5, 2] landmarks in crop-local coords
    out_size: int = 224,
) -> np.ndarray:
    """FasterCropAlignXRay semantics on the host (numpy + cv2), for the
    dataset writer's ``--aligned`` mode: ONE similarity is fit from the
    clip's stacked 5-pt landmarks against the canonical template and every
    frame is warped from the union canvas with it — temporally stable crops
    whose GEOMETRY matches what the serving scorer feeds the model
    (faster_crop_align_xray.py:21/:77; solver warp_for_xray.py:224).
    Returns ``[T, out_size, out_size, 3] uint8``."""
    import cv2

    T = len(crops)
    bb = np.asarray(big_boxes, np.float32)
    left_top = bb[:, :2].min(axis=0)
    right_bot = bb[:, 2:].max(axis=0)
    W = int(np.ceil(right_bot[0] - left_top[0]))
    H = int(np.ceil(right_bot[1] - left_top[1]))
    diffs = bb[:, :2] - left_top[None, :]
    pts = np.concatenate(
        [np.asarray(lm5_local[i], np.float32) + diffs[i][None, :]
         for i in range(T)], axis=0)
    tpl = np.tile(np.asarray(STD_POINTS_256 * (out_size / 256.0), np.float32),
                  (T, 1))
    M = find_similarity_np(pts, tpl)[:, :2].T   # 2x3 cv2 convention
    out = np.empty((T, out_size, out_size, 3), np.uint8)
    for i, c in enumerate(crops):
        canvas = np.zeros((H, W, 3), np.uint8)
        dx = int(round(float(diffs[i][0])))
        dy = int(round(float(diffs[i][1])))
        h = min(c.shape[0], H - dy)
        w = min(c.shape[1], W - dx)
        canvas[dy:dy + h, dx:dx + w] = c[:h, :w]
        out[i] = cv2.warpAffine(canvas, M, (out_size, out_size))
    return out
