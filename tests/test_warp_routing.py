"""Per-frame-scale alignment + host-side per-clip warp routing.

Covers the two round-2 scorer extensions:
- ``align_clip(scales=...)`` / ``_score_impl(scale=...)``: crops stored
  pre-scaled per frame with unscaled geometry (the device-ring path);
- ``clip_fit_drift`` + per-clip sub-batch routing: one tilted face demotes
  only its own sub-batch — shipped path='auto' so the scorer's in-graph
  envelope cond remains the correctness authority (reference semantics:
  faster_crop_align_xray.py one-transform-per-clip; VERDICT r1 #5).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig, PipelineConfig
from stdd_tpu.ops.align import STD_POINTS_256, align_clip, similarity_cv2, std_points
from stdd_tpu.ops.warp_pallas import pack_warp_params
from stdd_tpu.runtime.classifier import ClipScorer, clip_fit_drift
from stdd_tpu.runtime.engine import StreamingEngine
from tests.test_engine import PIPE, SMALL_CFG, make_fake_detector


def _face_geometry(T=4, S=64, seed=0, angle_deg=0.0):
    """Synthetic clip geometry: STD template landmarks jittered per frame,
    optionally rotated (roll) by angle_deg, inside [T] big boxes."""
    rng = np.random.RandomState(seed)
    lm_base = STD_POINTS_256 * (S / 256.0)
    a = np.deg2rad(angle_deg)
    R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    c = lm_base.mean(0)
    boxes = np.zeros((T, 4), np.float32)
    lm5 = np.zeros((T, 5, 2), np.float32)
    for t in range(T):
        jitter = rng.uniform(-1.0, 1.0, (5, 2))
        pts = (lm_base - c) @ R.T + c + jitter
        x0, y0 = rng.uniform(0, 20, 2)
        boxes[t] = [x0, y0, x0 + S, y0 + S]
        lm5[t] = pts
    return boxes, lm5


def test_scaled_align_exact_on_linear_images():
    """On images linear in (x, y), bilinear sampling is exact, so aligning
    per-frame-prescaled crops with ``scales`` must reproduce the unscaled
    alignment wherever the sample point is in-bounds for both."""
    T, S = 4, 64
    boxes, lm5 = _face_geometry(T=T, S=S)
    H = W = 96
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    plane = lambda y, x: np.stack([0.3 * x + 0.1 * y, 0.7 * y, 0.2 * x + 0.4 * y], -1)

    crops_full = np.stack([plane(ys, xs)] * T)            # crop[y,x] = f(x,y)
    scales = np.array([1.0, 0.75, 0.5, 0.9], np.float32)
    crops_scaled = np.zeros_like(crops_full)
    for t, s in enumerate(scales):
        # scaled crop: g[y,x] = f(x/s, y/s) sampled exactly (f is linear)
        crops_scaled[t] = plane(ys / s, xs / s)

    a_ref, _, _, _ = align_clip(
        jnp.asarray(crops_full), jnp.asarray(boxes), jnp.asarray(lm5), out_size=S
    )
    a_scaled, _, _, _ = align_clip(
        jnp.asarray(crops_scaled), jnp.asarray(boxes), jnp.asarray(lm5),
        out_size=S, scales=jnp.asarray(scales),
    )
    a_ref, a_scaled = np.asarray(a_ref), np.asarray(a_scaled)
    # compare only fully-interior samples: warp an all-ones indicator crop
    # through both paths — where either weight map < 1 a zero-border tap
    # contributed and the two paths legitimately see different extents
    ones = np.ones_like(crops_full)
    w_ref, _, _, _ = align_clip(
        jnp.asarray(ones), jnp.asarray(boxes), jnp.asarray(lm5), out_size=S
    )
    w_scaled, _, _, _ = align_clip(
        jnp.asarray(ones), jnp.asarray(boxes), jnp.asarray(lm5),
        out_size=S, scales=jnp.asarray(scales),
    )
    mask = (np.asarray(w_ref)[..., 0] > 1 - 1e-5) & (
        np.asarray(w_scaled)[..., 0] > 1 - 1e-5
    )
    assert mask.mean() > 0.5
    diff = np.abs(a_ref - a_scaled)[mask]
    assert diff.max() < 1e-2, diff.max()


def test_clip_fit_drift_matches_in_graph_envelope():
    """The numpy drift equals the |m10|·S + 10 quantity the jitted auto path
    derives from pack_warp_params, including the pack-scale factor."""
    T, S = 4, 64
    for seed, angle in [(0, 0.0), (1, 8.0), (2, 25.0), (3, -40.0)]:
        boxes, lm5 = _face_geometry(T=T, S=S, seed=seed, angle_deg=angle)
        for s in (1.0, 0.6):
            tpl = std_points(S)
            tgt = jnp.tile(tpl, (T, 1))
            left_top = (boxes[:, :2] * s).min(axis=0)
            diffs = boxes[:, :2] * s - left_top[None, :]
            pts = lm5 * s + diffs[:, None, :]
            tfm, _ = similarity_cv2(jnp.asarray(pts.reshape(-1, 2)), tgt)
            params = np.asarray(pack_warp_params(tfm, jnp.asarray(diffs)))
            graph = np.abs(params[:, 3]).max() * S + 10.0

            got = clip_fit_drift(
                boxes[None], lm5[None], S, template=np.asarray(tpl),
                scale=np.full((1, T), s, np.float32),
            )[0]
            assert got == pytest.approx(graph, rel=1e-3, abs=1e-2), (
                seed, angle, s, got, graph)


class _RecordingScorer:
    """Duck-typed scorer capturing each dispatch's path + which side of the
    drift band its valid clips sit on, so the router's grouping is
    observable."""

    upload_format = "rgb"
    use_pallas_warp = True

    def __init__(self, band):
        self.warp_band = band
        self.cfg = SMALL_CFG
        self._template = std_points(SMALL_CFG.crop_size)
        self.calls = []

    def score_async(self, crops, boxes, lm5, valid, path="auto"):
        n = int(np.asarray(valid).sum())
        # the packed geometry is already pack-scaled, so scale=None here
        drift = clip_fit_drift(
            np.asarray(boxes)[:n], np.asarray(lm5)[:n],
            SMALL_CFG.crop_size, template=np.asarray(self._template),
        )
        sides = {bool(d <= self.warp_band) for d in drift}
        self.calls.append((path, n, sides))
        return np.where(np.asarray(valid), 0.5, 0.0).astype(np.float32)

    def warmup(self, *a, **k):
        pass


def _two_pose_detector():
    """Two stable faces: one upright, one rolled 35 deg (past any sane
    Pallas band envelope at crop scale)."""
    S = 256.0
    lm_up = STD_POINTS_256 * (60.0 / S)
    a = np.deg2rad(35.0)
    R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    c = lm_up.mean(0)
    lm_rot = (lm_up - c) @ R.T + c

    def detect(frame_bgr):
        rows = []
        for k, lm in enumerate([lm_up, lm_rot]):
            x, y = 30 + 120 * k, 40.0
            pts = (lm + np.array([x, y])).reshape(-1)
            rows.append([x, y, 60.0, 70.0, *pts, 0.92])
        return np.asarray(rows, np.float32)

    return detect


def test_mixed_batch_routes_per_clip():
    """A batch straddling the band is SPLIT into same-side sub-batches, and
    every sub-batch ships path='auto' — the in-graph envelope cond stays the
    correctness authority (the host drift probe is only a grouping hint), so
    a near-band disagreement can never statically force the wrong warp, and
    the warmed 'auto' executables cover everything the router dispatches."""
    scorer = _RecordingScorer(band=24)
    eng = StreamingEngine(
        scorer, _two_pose_detector(), cfg=PIPE, crop_buffer=160,
        q_lap_hard=0.0, q_lap_soft=0.0, q_weighting=False,
    )
    # sanity: the two tracks straddle the band
    for fr in [np.zeros((240, 320, 3), np.uint8)] * 12:
        eng.step(fr)
    eng.flush()
    assert scorer.calls, "nothing dispatched"
    assert all(p == "auto" for p, _, _ in scorer.calls), scorer.calls
    # no dispatch mixed in-band and out-of-band clips
    for _, _, sides in scorer.calls:
        assert len(sides) == 1, scorer.calls
    # both sides of the band were actually scored (the out-of-envelope face
    # was not dropped, and it did not drag its peer with it)
    seen = {s for _, _, sides in scorer.calls for s in sides}
    assert seen == {True, False}, scorer.calls
    assert len(eng.track_clip_scores) == 2
