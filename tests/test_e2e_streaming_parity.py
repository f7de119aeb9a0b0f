"""END-TO-END streaming (TEST2) score parity — round-2 VERDICT #5.

Mirrors tests/test_e2e_parity.py for the STREAMING flow (TEST2.py:259-447):
shipped YuNet cache geometry (examples/shining.mp4_32_yunet_320.pth) +
deterministic frames driven through

- the REFERENCE composition: imported BYTETracker/STrack, imported
  iou_distance, imported get_crop_box, imported FasterCropAlignXRay,
  the reference torch I3D (converted-weights source), the reference's
  window_id/keep_ranges windowing and buffer-trim semantics
  (TEST2.py:354-393,:459-480), and the reference's OWN ``_pool_track``/
  ``score_with_stability`` bytecode (tests/oracles/ref_scoring.py);
- OUR pipeline: StreamingEngine → ClipScorer (converted weights) →
  finish() aggregation — the eval/harness.py per-video flow.

Convention note (documented, not silently papered over): TEST2.py:536
passes tlbr into STrack's tlwh slot, which inflates every Kalman box; the
pipeline survives because MediaPipe re-finds the face inside the inflated
ROI (TEST2.py:577). MediaPipe does not exist in this environment, so this
composition uses the production STrack convention of af_realtime.py:388
(proper tlwh) — the reference's own yunet-lm5 fallback (TEST2.py:581-585)
then supplies landmarks, and ref-vs-ours tracking parity for that
convention is separately proven in tests/test_tracking.py."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference/altfreezing"
CACHE = REF + "/examples/shining.mp4_32_yunet_320.pth"

CLIP = 8
STRIDE = 4
IMSIZE = 128    # multiple of 64 so the torch head pool covers the whole map
FRAME_HW = (480, 854)


def _cache_rows():
    """Per-frame YuNet-style [x, y, w, h, lm10, score] rows from the shipped
    cache (absolute tlbr box + absolute lm5 + score)."""
    from stdd_tpu.eval.demo import load_reference_cache

    detect_res, _ = load_reference_cache(CACHE)
    per_frame = []
    for faces in detect_res:
        rows = []
        for box, lm5, score in faces:
            box = np.asarray(box, np.float32)
            lm5 = np.asarray(lm5, np.float32).reshape(5, 2)
            rows.append([box[0], box[1], box[2] - box[0], box[3] - box[1],
                         *lm5.reshape(-1), float(score)])
        per_frame.append(np.asarray(rows, np.float32) if rows
                         else np.empty((0, 15), np.float32))
    return per_frame


def _reference_streaming(frames, per_frame_rows, ref_model, torch):
    """The TEST2 streaming loop composed from imported reference pieces."""
    from tests.test_tracking import _load_ref_tracker

    BYTETracker = _load_ref_tracker()
    from preprocessing.ByteTrack.byte_tracker import STrack
    from preprocessing.ByteTrack.matching import iou_distance

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from test_tools.faster_crop_align_xray import FasterCropAlignXRay
    from test_tools.utils import get_crop_box as ref_get_crop_box

    class Args:
        track_thresh = 0.6
        match_thresh = 0.6
        track_buffer = 30
        mot20 = False

    tracker = BYTETracker(Args(), frame_rate=30)
    crop_align = FasterCropAlignXRay(IMSIZE)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)[None, :, None, None, None] * 255
    std = np.asarray([0.229, 0.224, 0.225], np.float32)[None, :, None, None, None] * 255

    H, W = FRAME_HW
    total = len(frames)
    # TEST2.py:448-470 offline windowing: stride starts + first-match window id
    starts = list(range(0, max(0, total - CLIP) + 1, STRIDE))
    keep_ranges = [(s, min(s + CLIP - 1, total - 1)) for s in starts]

    def window_id(i):
        for k, (lo, hi) in enumerate(keep_ranges):
            if lo <= i <= hi:
                return k
        return -1

    cur_imgs, cur_infos = {}, {}
    last_win = {}
    track_clip_scores = {}

    def infer_clip(infos, imgs):
        fixed = []
        for nb, lm5, big in infos:
            fixed.append((np.asarray(nb, np.float32).reshape(4),
                          np.asarray(lm5, np.float32).reshape(5, 2),
                          np.zeros((68, 2), np.float32),
                          np.asarray(big, np.int32).reshape(4)))
        _, aligned = crop_align(fixed, imgs)
        x = torch.from_numpy(
            aligned.astype(np.float32).transpose(3, 0, 1, 2)[None])
        x = (x - torch.from_numpy(mean)) / torch.from_numpy(std)
        with torch.no_grad():
            out = ref_model([x])
        return float(torch.sigmoid(out).item())

    def enqueue(tid):
        imgs, infos = cur_imgs[tid], cur_infos[tid]
        if len(imgs) < CLIP:
            need = CLIP - len(imgs)
            imgs = imgs + [imgs[-1]] * need
            infos = infos + [infos[-1]] * need
        track_clip_scores.setdefault(tid, []).append(
            infer_clip(infos[:CLIP], imgs[:CLIP]))
        keep_last = 0 if STRIDE >= CLIP else CLIP - STRIDE
        cur_imgs[tid] = cur_imgs[tid][-keep_last:] if keep_last else []
        cur_infos[tid] = cur_infos[tid][-keep_last:] if keep_last else []

    for frame_idx, (fbgr, rows) in enumerate(zip(frames, per_frame_rows)):
        det_tlbr = None
        tracks_in = []
        if len(rows):
            det_tlbr = np.stack([
                [r[0], r[1], r[0] + r[2], r[1] + r[3]] for r in rows
            ]).astype(np.float32)
            tracks_in = [STrack(np.array([r[0], r[1], r[2], r[3]]),
                                float(r[14])) for r in rows]
        online = tracker.update(tracks_in, (H, W), (H, W))
        frgb = fbgr[:, :, ::-1]

        for tr in online or []:
            tid = tr.track_id
            cur_imgs.setdefault(tid, [])
            cur_infos.setdefault(tid, [])
            # yunet-lm5 fallback path (TEST2.py:581-585)
            lm5 = None
            if det_tlbr is not None and len(det_tlbr):
                ious = 1.0 - iou_distance(
                    np.array([tr.tlbr], np.float32), det_tlbr)[0]
                k = int(np.argmax(ious))
                if ious[k] >= 0.4:
                    lm5 = rows[k][4:14].reshape(5, 2).astype(np.float32)
            if lm5 is None:
                continue
            big = ref_get_crop_box((H, W), tr.tlbr, scale=0.5)
            x1, y1, x2, y2 = map(int, big)
            if x2 <= x1 or y2 <= y1:
                continue
            crop_rgb = np.ascontiguousarray(frgb[y1:y2, x1:x2])
            top_left = np.array([[x1, y1]], np.float32)
            new_box = (tr.tlbr.reshape(2, 2).astype(np.float32)
                       - top_left).reshape(-1)
            cur_infos[tid].append(
                (new_box, lm5 - top_left, np.array([x1, y1, x2, y2], np.int32)))
            cur_imgs[tid].append(crop_rgb)

            wid = window_id(frame_idx)
            if len(cur_imgs[tid]) >= CLIP and wid != -1 and last_win.get(tid) != wid:
                enqueue(tid)
                last_win[tid] = wid
    return track_clip_scores


@pytest.mark.slow
def test_streaming_pipeline_score_parity():
    torch = pytest.importorskip("torch")
    from tests.oracles.ref_i3d import build_reference_i3d
    from tests.oracles.ref_scoring import reference_pool_fns

    from stdd_tpu.config import I3DConfig, PipelineConfig
    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.runtime.engine import StreamingEngine
    from stdd_tpu.utils.torch_convert import i3d_torch_to_flax

    per_frame_rows = _cache_rows()
    n = len(per_frame_rows)
    assert n >= 24
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, FRAME_HW + (3,), np.uint8) for _ in range(n)]

    ref_model = build_reference_i3d(num_frames=CLIP, crop_size=IMSIZE, seed=0)
    ref_scores = _reference_streaming(frames, per_frame_rows, ref_model, torch)
    assert ref_scores and all(v for v in ref_scores.values())

    # ---- our side: the harness/engine streaming flow ----------------------
    variables = i3d_torch_to_flax(ref_model.state_dict())
    scorer = ClipScorer(
        variables, cfg=I3DConfig(num_frames=CLIP, crop_size=IMSIZE),
        dtype=jnp.float32, round_aligned_u8=True,
    )
    state = {"i": 0}

    def detect_fn(frame_bgr):
        rows = per_frame_rows[state["i"]]
        state["i"] += 1
        return rows

    pipe = PipelineConfig(clip_size=CLIP, imsize=IMSIZE, stride=STRIDE,
                          detect_every=1, batch_clips=4, min_face_side=0)
    eng = StreamingEngine(
        scorer, detect_fn, cfg=pipe, crop_buffer=512,
        start_conf=0.0, q_min_size_hard=0, q_lap_hard=0.0, q_weighting=False,
        track_kwargs=dict(track_thresh=0.6, match_thresh=0.6, track_buffer=30,
                          split_low_scores=False),
        max_batch_wait_frames=None, device_resident=False,
    )
    for f in frames:
        eng.step(f)
    eng.flush()
    our_scores = {t: list(v) for t, v in eng.track_clip_scores.items()}

    # ---- per-clip score-sequence parity (track order-insensitive) ---------
    assert len(our_scores) == len(ref_scores), (our_scores, ref_scores)
    ref_seqs = sorted(ref_scores.values(), key=lambda s: (len(s), s[0]))
    our_seqs = sorted(our_scores.values(), key=lambda s: (len(s), s[0]))
    for rs, os_ in zip(ref_seqs, our_seqs):
        assert len(rs) == len(os_), (ref_seqs, our_seqs)
        np.testing.assert_allclose(os_, rs, atol=2e-3)

    # ---- per-video score parity via the reference's OWN pooling bytecode --
    ref_pool, ref_stab = reference_pool_fns()
    ref_video = max(
        ref_pool(s, method="mean", topk_ratio=0.2, percentile_p=80.0,
                 trim_ratio=0.2)
        for s in ref_scores.values())
    verdict = eng.finish(threshold=0.5)   # pipe.pool_method defaults to mean
    assert verdict.video_score == pytest.approx(ref_video, abs=2e-3)
