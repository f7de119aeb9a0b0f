"""Clip-scoring service: fused align → normalize → I3D → sigmoid on device.

Replaces the reference's ``ClassifierSvc.infer_scores`` + host-side cv2 align
loop (TEST2.py:139-150, faster_crop_align_xray.py:21): the whole chain —
similarity solve, batched warp, ImageNet normalization, the 3D-CNN forward and
the sigmoid — is ONE jitted XLA program. Inputs are fixed-capacity padded
batches so there is exactly one compilation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import I3DConfig
from ..models.i3d import I3D, IMAGENET_MEAN, IMAGENET_STD
from ..ops.align import align_clip, similarity_cv2, std_points
from ..ops.warp_pallas import pack_warp_params, warp_clip_pallas


def yuv420_to_rgb(planar):
    """I420 planar frames → float32 RGB, matching cv2's BT.601 video-range
    decode (COLOR_YUV2RGB_I420) with its nearest-neighbor chroma upsample,
    but without the final uint8 rounding. ``planar`` [..., S*3//2, S] uint8
    → [..., S, S, 3] float32 in 0..255."""
    S = planar.shape[-1]
    y = planar[..., :S, :].astype(jnp.float32)
    u = planar[..., S : S + S // 4, :].reshape(planar.shape[:-2] + (S // 2, S // 2))
    v = planar[..., S + S // 4 :, :].reshape(planar.shape[:-2] + (S // 2, S // 2))
    u = jnp.repeat(jnp.repeat(u.astype(jnp.float32), 2, -2), 2, -1) - 128.0
    v = jnp.repeat(jnp.repeat(v.astype(jnp.float32), 2, -2), 2, -1) - 128.0
    yl = 1.164 * (y - 16.0)
    r = yl + 1.596 * v
    g = yl - 0.391 * u - 0.813 * v
    b = yl + 2.018 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def clip_fit_drift(
    boxes: np.ndarray,          # [B, T, 4] big boxes (same scale-space as lm5)
    lm5: np.ndarray,            # [B, T, 5, 2] crop-local landmarks
    out_size: int,
    template: Optional[np.ndarray] = None,
    scale: Optional[np.ndarray] = None,   # [B, T] per-frame crop scales
) -> np.ndarray:
    """Per-clip row-drift of the inverse similarity fit, host-side numpy —
    the same envelope quantity the scorer's in-graph auto path checks
    (``|m10|·S + 10``). The dispatch worker uses it to route each clip to
    the Pallas warp (drift ≤ band) or the exact gather, so ONE tilted face
    demotes one clip, not the whole batch (VERDICT r1 #5)."""
    from ..ops.align import STD_POINTS_256

    boxes = np.asarray(boxes, np.float64)
    lm5 = np.asarray(lm5, np.float64)
    B, T = boxes.shape[:2]
    tpl = (
        np.asarray(template, np.float64)
        if template is not None
        else STD_POINTS_256 * (out_size / 256.0)
    )
    tgt = np.tile(tpl, (T, 1))
    drifts = np.zeros((B,), np.float32)
    for b in range(B):
        left_top = boxes[b, :, :2].min(axis=0)
        diffs = boxes[b, :, :2] - left_top[None, :]
        src = (lm5[b] + diffs[:, None, :]).reshape(-1, 2)
        # 4-unknown nonreflective similarity (ops/align._solve_nonreflective);
        # for face geometry the reflective candidate never wins, and drift is
        # symmetric under reflection anyway
        m = src.shape[0]
        x, y = tgt[:, 0], tgt[:, 1]
        X = np.zeros((2 * m, 4))
        X[:m, 0], X[:m, 1], X[:m, 2] = x, y, 1.0
        X[m:, 0], X[m:, 1], X[m:, 3] = y, -x, 1.0
        U = np.concatenate([src[:, 0], src[:, 1]])
        try:
            r = np.linalg.solve(X.T @ X, X.T @ U)
        except np.linalg.LinAlgError:
            drifts[b] = np.inf
            continue
        # r = [sc, ss, tx, ty] parameterizes the dst→src map — exactly the
        # matrix pack_warp_params ends up with (its Minv linear part is
        # [[sc, ss], [-ss, sc]] in column convention), so |m10| = |ss|
        m10 = abs(r[1])
        s_max = 1.0 if scale is None else float(np.max(scale[b]))
        drifts[b] = m10 * s_max * out_size + 10.0
    return drifts


class ClipScorer:
    """Batched scorer over per-track clip buffers.

    ``score(crops, boxes, lm5, valid)``:
      crops [B, T, Hc, Wc, 3] uint8 RGB (zero-padded big-box crops)
      boxes [B, T, 4] absolute big-box (x1, y1, x2, y2)
      lm5   [B, T, 5, 2] crop-local 5-point landmarks
      valid [B] bool — padding rows are skipped in spirit (scored but masked)
    → probs [B] float32 (sigmoid of the final logit).
    """

    def __init__(
        self,
        variables,
        cfg: Optional[I3DConfig] = None,
        dtype=jnp.bfloat16,
        score_index: int = 0,
        use_pallas_warp: Optional[bool] = None,
        warp_band: int = 64,
        round_aligned_u8: bool = False,
        s2d_stem: Optional[bool] = None,
        upload_format: str = "rgb",
        int8: bool = False,
    ):
        self.cfg = cfg or I3DConfig()
        on_accel = jax.devices()[0].platform not in ("cpu",)
        if use_pallas_warp is None:
            # the Mosaic kernel needs a real TPU (not just any accelerator);
            # CPU tests and GPU backends take the XLA gather path
            use_pallas_warp = jax.devices()[0].platform == "tpu"
        self.use_pallas_warp = use_pallas_warp
        self.warp_band = warp_band
        # cv2.warpAffine on a uint8 canvas rounds to uint8 before the model
        # sees the pixels (faster_crop_align_xray.py:85); enable to reproduce
        # the reference's quantization exactly (costs a little fidelity)
        self.round_aligned_u8 = round_aligned_u8
        # space-to-depth stem: identical math + identical param tree, ~2x the
        # whole-model forward on TPU (the C=3 stride-2 stem is MXU-hostile);
        # requires even H/W and the [t,7,7] stem, so auto-on for accelerators
        if s2d_stem is None:
            s2d_stem = on_accel and not self.cfg.temporal_only and self.cfg.crop_size % 2 == 0
        if s2d_stem and not self.cfg.s2d_stem:
            self.cfg = dataclasses.replace(self.cfg, s2d_stem=True)
        # temporal-pair packed stem (eval-only, folded BN — exact math,
        # ~1.5x the s2d stem on TPU); the scorer always runs train=False
        if self.cfg.s2d_stem and not self.cfg.stem_t2 and self.cfg.num_frames % 2 == 0:
            self.cfg = dataclasses.replace(self.cfg, stem_t2=True)
        # int8 dynamic-quant convs for the wide stages (eval-only serving
        # knob; s8×s8→s32 runs the MXU at 2× the bf16 rate). Only s3-s5 —
        # the 64-wide s2 convs measured SLOWER in int8 (PERF.md "Dead ends").
        # Scores shift by the quantization error; opt-in per CLI --int8.
        if int8 and not self.cfg.int8_stages:
            self.cfg = dataclasses.replace(
                self.cfg, int8_stages=("s3", "s4", "s5"))
        # "yuv420": score() takes planar I420 crops [B,T,S*3//2,S] (packed by
        # pack_clip_batch(yuv420=True)) — half the host→device bytes, which
        # is the streaming bottleneck on bandwidth-constrained links. The
        # codec already delivered 4:2:0 frames, so nothing real is lost.
        if upload_format not in ("rgb", "yuv420"):
            raise ValueError(f"upload_format must be 'rgb' or 'yuv420', got {upload_format!r}")
        self.upload_format = upload_format
        self.model = I3D(cfg=self.cfg, dtype=dtype)
        self.variables = variables
        self.score_index = score_index
        self._template = std_points(self.cfg.crop_size)
        self._score = jax.jit(self._score_impl)
        self._score_feats = jax.jit(
            lambda c, b, l, v: self._score_impl(c, b, l, v, with_features=True)
        )
        # jitted variants keyed on (path, scaled): 'pallas'/'gather' forced
        # branches for host-side per-clip routing, plus per-frame-scale
        # versions for the device-ring path. The lock closes a cache-miss
        # race: the two dispatch lanes could otherwise each build (and XLA-
        # compile) their own executable for the same key (ADVICE r2 #2).
        self._score_variants = {("auto", False): self._score}
        import threading as _threading

        self._variants_lock = _threading.Lock()

    def _align_batch(self, crops, boxes, lm5, valid, scale=None, path="auto"):
        """Batched clip-stable alignment. On TPU the warp runs as the Pallas
        band-matmul kernel (ops/warp_pallas.py, ~19x the XLA gather); the
        envelope covers |roll| ≲ 13 deg at band 64 — beyond that (or on CPU)
        the exact gather path is used.

        ``scale`` [B, T]: per-frame uniform crop scales — crops are stored
        pre-scaled while boxes/lm5 stay unscaled (the device-ring streaming
        path). ``path``: 'auto' = in-graph envelope cond (whole batch);
        'pallas'/'gather' = statically forced branch — the dispatch worker
        routes each clip host-side (clip_fit_drift) so one tilted face costs
        one clip in the gather sub-batch, not the whole batch."""
        S = self.cfg.crop_size
        if not self.use_pallas_warp:
            path = "gather"
        B, T = crops.shape[:2]

        def gather_branch(crops, boxes, lm5, params):
            sc = scale if scale is not None else jnp.ones((B, T), jnp.float32)

            def align_one(c, b, l, s):
                a, _, _, _ = align_clip(
                    c, b, l, out_size=S, template=self._template, scales=s
                )
                return a

            return jax.vmap(align_one)(crops, boxes, lm5, sc)

        if path == "gather":
            return gather_branch(crops, boxes, lm5, None)

        tgt = jnp.tile(self._template, (T, 1))

        def solve_one(b, l):
            left_top = jnp.min(b[:, :2], axis=0)
            diffs = b[:, :2] - left_top[None, :]
            pts = l + diffs[:, None, :]
            tfm, _ = similarity_cv2(pts.reshape(-1, 2), tgt)
            return pack_warp_params(tfm, diffs)

        params = jax.vmap(solve_one)(boxes, lm5)           # [B, T, 8]
        if scale is not None:
            # sample point in the pre-scaled crop is s_t·(A⁻¹p − d_t): fold
            # the per-frame factor into the packed dst→src affine
            params = params * scale[..., None]

        def pallas_branch(crops, boxes, lm5, params):
            flat = warp_clip_pallas(
                crops.reshape((B * T,) + crops.shape[2:]),
                params.reshape(B * T, 8),
                out_size=S,
                band=self.warp_band,
            )
            return flat.reshape((B, T, S, S, 3))

        if path == "pallas":
            return pallas_branch(crops, boxes, lm5, params)

        # rotation envelope (warp_pallas.rotation_fits_band, in-graph): the
        # band covers |m10|·S + ~10 rows of drift; beyond that fall back to
        # the exact gather for the whole batch. Padded (invalid) slots hold
        # all-zero landmarks whose similarity fit is NaN — they are masked
        # out so a partial batch doesn't silently disable the fast path.
        drift_bt = jnp.abs(params[..., 3])                 # [B, T]
        drift_bt = jnp.where(valid[:, None], drift_bt, 0.0)
        drift = jnp.max(drift_bt) * S + 10.0
        return jax.lax.cond(
            drift <= self.warp_band, pallas_branch, gather_branch,
            crops, boxes, lm5, params,
        )

    @classmethod
    def random_init(cls, cfg: Optional[I3DConfig] = None, seed: int = 0, **kw):
        cfg = cfg or I3DConfig()
        model = I3D(cfg=cfg)
        sample = jnp.zeros((1, cfg.num_frames, cfg.crop_size, cfg.crop_size, 3))
        variables = jax.jit(
            lambda r: model.init(r, sample, train=False)
        )(jax.random.PRNGKey(seed))
        return cls(variables, cfg=cfg, **kw)

    @classmethod
    def from_torch_checkpoint(cls, path: str, cfg: Optional[I3DConfig] = None, **kw):
        from ..utils.torch_convert import load_reference_checkpoint

        variables = load_reference_checkpoint(path)
        variables = jax.tree.map(jnp.asarray, variables)
        return cls(variables, cfg=cfg, **kw)

    @classmethod
    def from_jax_checkpoint(cls, path: str, cfg: Optional[I3DConfig] = None, **kw):
        """Serve weights trained by this framework's own trainer.

        Loads a ``{name}_{epoch}.msgpack`` pytree checkpoint written by
        ``stdd_tpu.train.run_i3d`` / ``utils.checkpoint.save_checkpoint``
        (``params`` + ``batch_stats``; a trailing ``opt_state`` is ignored)
        through the tolerant merger, and refuses to serve a checkpoint that
        does not fully cover the model. ``cfg`` must match the training
        geometry; when omitted it is reconstructed from the trainer's
        sidecar metadata (``{path}.json`` — crop_size/clip_size, ADVICE r4
        #2) so a non-224 crop checkpoint is never silently served at 224.
        Reference analogue: serving a ModelBase epoch checkpoint
        (model/_base.py:39 load)."""
        from flax import serialization

        from ..utils.checkpoint import tolerant_merge

        if cfg is None:
            cfg = I3DConfig()
            try:
                import json as _json

                with open(path + ".json") as f:
                    meta = _json.load(f)
                cfg = I3DConfig(
                    num_frames=int(meta.get("clip_size", cfg.num_frames)),
                    crop_size=int(meta.get("crop_size", cfg.crop_size)),
                    temporal_only=bool(meta.get("temporal_only", False)))
            except FileNotFoundError:
                pass
        model = I3D(cfg=cfg)
        sample = jnp.zeros((1, cfg.num_frames, cfg.crop_size, cfg.crop_size, 3))
        variables = jax.jit(
            lambda r: model.init(r, sample, train=False)
        )(jax.random.PRNGKey(0))
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        target = {"params": variables["params"],
                  "batch_stats": variables["batch_stats"]}
        src = {k: raw[k] for k in ("params", "batch_stats") if k in raw}
        merged, report = tolerant_merge(target, src)
        if report["missing"] or report["shape_mismatch"]:
            raise ValueError(
                f"{path} does not cover the model (cfg={cfg}): "
                f"missing={report['missing'][:5]} "
                f"shape_mismatch={report['shape_mismatch'][:5]}")
        merged = jax.tree.map(jnp.asarray, merged)
        return cls({"params": merged["params"],
                    "batch_stats": merged["batch_stats"]}, cfg=cfg, **kw)

    def _score_fn(self, path: str = "auto", scaled: bool = False):
        """Cached jitted scorer for a statically-forced warp path, optionally
        taking a per-frame ``scale [B, T]`` argument (device-ring windows)."""
        key = (path, scaled)
        fn = self._score_variants.get(key)
        if fn is None:
            with self._variants_lock:
                fn = self._score_variants.get(key)
                if fn is None:
                    if scaled:
                        fn = jax.jit(
                            lambda c, b, l, v, s: self._score_impl(
                                c, b, l, v, scale=s, path=path
                            )
                        )
                    else:
                        fn = jax.jit(
                            lambda c, b, l, v: self._score_impl(c, b, l, v, path=path)
                        )
                    self._score_variants[key] = fn
        return fn

    def _score_impl(self, crops, boxes, lm5, valid, with_features: bool = False,
                    variables=None, scale=None, path: str = "auto"):
        S = self.cfg.crop_size
        # loud format check: a facade that forgot to forward upload_format
        # (packing.upload_format_of) must fail here, not decode garbage
        if self.upload_format == "yuv420":
            if crops.ndim != 4:
                raise ValueError(
                    f"upload_format='yuv420' expects planar I420 crops "
                    f"[B,T,S*3//2,S]; got shape {crops.shape} (pack with yuv420=True)"
                )
            crops = yuv420_to_rgb(crops)
        elif crops.ndim != 5:
            raise ValueError(
                f"upload_format='rgb' expects crops [B,T,H,W,3]; got shape "
                f"{crops.shape}"
            )
        aligned = self._align_batch(
            crops, boxes.astype(jnp.float32), lm5.astype(jnp.float32), valid,
            scale=scale, path=path,
        )  # [B, T, S, S, 3] float32 (0..255)
        if self.round_aligned_u8:
            aligned = jnp.round(jnp.clip(aligned, 0, 255))
        x = (aligned - IMAGENET_MEAN) / IMAGENET_STD
        variables = self.variables if variables is None else variables
        if with_features:
            logits, feats = self.model.apply(
                variables, x, train=False, return_features=True
            )
        else:
            logits = self.model.apply(variables, x, train=False)
        probs = jax.nn.sigmoid(logits[:, self.score_index].astype(jnp.float32))
        probs = jnp.where(valid, probs, 0.0)
        if with_features:
            return probs, logits.astype(jnp.float32), feats
        return probs

    def warmup(self, crop_buffer: int, batch_capacities=(1, 2, 4, 8),
               clip_size: Optional[int] = None, paths=None,
               windows: bool = False) -> None:
        """Pre-compile the fused scorer for every batch capacity the engine
        can dispatch (power-of-2 partial batches), so serving never compiles
        in the hot path — first-clip latency through a cold process is
        otherwise a full XLA compile. Blocks until all executables exist.

        ``paths``: which warp branches to warm; default 'auto' — the only
        path the dispatch worker ships (its per-clip router splits batches
        host-side but always dispatches 'auto', whose executable contains
        BOTH warp branches in its in-graph cond — so this default covers
        everything serving can hit, including the first out-of-envelope
        face). ``windows=True`` additionally warms the device-ring
        ``score_windows`` variants."""
        T = clip_size or self.cfg.num_frames
        S = crop_buffer
        if paths is None:
            paths = ("auto",)
        slot = (T, S * 3 // 2, S) if self.upload_format == "yuv420" else (T, S, S, 3)
        for path in paths:
            for b in batch_capacities:
                crops = np.zeros((b,) + slot, np.uint8)
                boxes = np.ones((b, T, 4), np.float32)
                lm5 = np.ones((b, T, 5, 2), np.float32)
                valid = np.zeros((b,), bool)
                np.asarray(self._score_fn(path)(
                    jnp.asarray(crops), jnp.asarray(boxes),
                    jnp.asarray(lm5), jnp.asarray(valid),
                ))
                if windows:
                    ws = [jnp.zeros(slot, jnp.uint8)] * b
                    np.asarray(self.score_windows(
                        ws, boxes, lm5, np.ones((b, T), np.float32), valid,
                        path=path,
                    ))

    def score(self, crops, boxes, lm5, valid) -> np.ndarray:
        out = self._score(
            jnp.asarray(crops), jnp.asarray(boxes), jnp.asarray(lm5), jnp.asarray(valid)
        )
        return np.asarray(out)

    def score_async(self, crops, boxes, lm5, valid, path: str = "auto"):
        """Dispatch without blocking: returns the device array immediately.

        JAX dispatch is asynchronous — the host thread returns while the
        TPU aligns+scores; materialize with ``np.asarray`` (or poll
        ``.is_ready()``). This is what lets the streaming engine overlap
        decode/track of the next frames with scoring of the previous batch.
        ``path`` statically forces the warp branch ('pallas'/'gather') when
        the caller has already routed the batch host-side (clip_fit_drift).
        """
        return self._score_fn(path)(
            jnp.asarray(crops), jnp.asarray(boxes), jnp.asarray(lm5), jnp.asarray(valid)
        )

    def score_windows(self, windows, boxes, lm5, scale, valid, path: str = "auto"):
        """Score a batch of device-resident ring windows asynchronously.

        ``windows``: LIST of device arrays, each [T,S,S,3] uint8 RGB (or
        planar I420 [T,S*3//2,S]) already living in HBM (DeviceRing.window
        gathers); only ``boxes``/``lm5``/``scale``/``valid`` — kilobytes of
        geometry — cross the host→device boundary at dispatch time.
        Geometry is UNSCALED; the per-frame pack scale [B,T] is folded into
        the warp (exact: a similarity absorbs a uniform scale). Returns the
        device probs array immediately (materialize with np.asarray)."""
        key = ("windows", len(windows), path)
        fn = self._score_variants.get(key)
        if fn is None:
            with self._variants_lock:
                fn = self._score_variants.get(key)
                if fn is None:
                    fn = jax.jit(
                        lambda ws, b, l, v, s: self._score_impl(
                            jnp.stack(ws), b, l, v, scale=s, path=path
                        )
                    )
                    self._score_variants[key] = fn
        return fn(
            list(windows), jnp.asarray(boxes, jnp.float32),
            jnp.asarray(lm5, jnp.float32), jnp.asarray(valid),
            jnp.asarray(scale, jnp.float32),
        )

    def _make_dense_fn(self, T: int):
        """Jitted dense-window scorer for a given window length (cached per
        T; the track-buffer length is bucketed by the caller so the XLA
        executable count stays bounded)."""

        def impl(frames, boxes, lm5, starts, valid):
            # Dense sliding windows over a device-resident track buffer:
            # each frame lands in HBM ONCE and the B windows are
            # dynamic-slice views — the TPU-native replacement for
            # re-uploading every stride-1 window (demo.py:275-302 / TEST2
            # window schedule). Per-window clip-stable alignment is computed
            # from the sliced boxes/landmarks, so results match the packed
            # path exactly.
            def window(start):
                c = jax.lax.dynamic_slice_in_dim(frames, start, T, axis=0)
                b = jax.lax.dynamic_slice_in_dim(boxes, start, T, axis=0)
                l = jax.lax.dynamic_slice_in_dim(lm5, start, T, axis=0)
                return c, b, l

            crops, bxs, lms = jax.vmap(window)(starts)
            return self._score_impl(crops, bxs, lms, valid)

        return jax.jit(impl)

    def score_dense(self, frames, boxes, lm5, starts, batch: int = 8,
                    clip_size: Optional[int] = None) -> np.ndarray:
        """Score every sliding window of one track. ``frames`` [N,S,S,3]
        uint8 (uniformly pre-scaled crops), ``boxes`` [N,4], ``lm5`` [N,5,2],
        ``starts`` window start indices (each start+clip_size <= N).
        → probs [len(starts)]. The track buffer is uploaded once; windows are
        sliced on device in fixed-size batches. To bound recompiles across
        varying track lengths, N is padded up to the next multiple of 64
        (executables are keyed on (clip_size, bucketed N, batch))."""
        T = clip_size or self.cfg.num_frames
        starts = np.asarray(starts, np.int32)
        hi = frames.shape[0] - T
        if starts.size and (starts.min() < 0 or starts.max() > hi):
            # dynamic_slice would CLAMP silently → wrong window, no error
            raise ValueError(
                f"window starts must be in [0, {hi}] for a {frames.shape[0]}-frame "
                f"track with clip_size={T}; got [{starts.min()}, {starts.max()}]"
            )
        n = frames.shape[0]
        n_bucket = max(T, -(-n // 64) * 64)
        if n_bucket != n:
            pad = n_bucket - n
            frames = np.concatenate([frames, np.zeros((pad,) + frames.shape[1:], frames.dtype)])
            boxes = np.concatenate([boxes, np.ones((pad, 4), np.float32)])
            lm5 = np.concatenate([lm5, np.ones((pad, 5, 2), np.float32)])
        if not hasattr(self, "_dense_fns"):
            self._dense_fns = {}
        fn = self._dense_fns.setdefault(T, self._make_dense_fn(T))
        frames = jnp.asarray(frames)
        boxes = jnp.asarray(boxes, jnp.float32)
        lm5 = jnp.asarray(lm5, jnp.float32)
        out = np.zeros((len(starts),), np.float32)
        for i in range(0, len(starts), batch):
            chunk = starts[i : i + batch]
            valid = np.zeros((batch,), bool)
            valid[: len(chunk)] = True
            padded = np.zeros((batch,), np.int32)
            padded[: len(chunk)] = chunk
            probs = fn(frames, boxes, lm5, jnp.asarray(padded), jnp.asarray(valid))
            out[i : i + len(chunk)] = np.asarray(probs)[: len(chunk)]
        return out

    def score_with_features(self, crops, boxes, lm5, valid):
        """(probs [B], logits [B, C], penultimate feats [B, 2048]) — the
        reference captures these with a forward hook for its RGB-fusion
        branch (altfreezing/feature.py:92 AFModel)."""
        probs, logits, feats = self._score_feats(
            jnp.asarray(crops), jnp.asarray(boxes), jnp.asarray(lm5), jnp.asarray(valid)
        )
        import numpy as _np

        return _np.asarray(probs), _np.asarray(logits), _np.asarray(feats)
