"""Detection / track / landmark visualization (the reference's YuNet demo,
``preprocessing/yunet/demoYunet.py:104``, extended to tracks + dense
landmarks).

- :func:`visualize_detections` — boxes, confidences, 5-pt landmarks with the
  reference's color scheme (per-landmark colors, green box, red text);
- :func:`visualize_tracks` — per-track-id colored boxes over time;
- CLI: annotate an image or a video with detections (+ optional tracking and
  dense FaceMesh landmarks) and write the result::

      python -m stdd_tpu.eval.viz --input in.mp4 --output out.mp4 \
          [--track] [--dense_landmarks] [--max_frames N]
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# per-landmark colors, BGR (demoYunet.py:106): right eye, left eye, nose
# tip, right mouth corner, left mouth corner
LANDMARK_COLORS = [
    (255, 0, 0), (0, 0, 255), (0, 255, 0), (255, 0, 255), (0, 255, 255),
]


def visualize_detections(image_bgr, rows, box_color=(0, 255, 0),
                         text_color=(0, 0, 255), fps: Optional[float] = None):
    """Draw [N, 15] detector rows (x, y, w, h, 5×(lx, ly), conf) — the
    reference ``visualize`` (demoYunet.py:104)."""
    import cv2

    out = image_bgr.copy()
    if fps is not None:
        cv2.putText(out, f"FPS: {fps:.2f}", (0, 15),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, text_color)
    for det in np.asarray(rows).reshape(-1, 15):
        x, y, w, h = det[:4].astype(np.int32)
        cv2.rectangle(out, (x, y), (x + w, y + h), box_color, 2)
        cv2.putText(out, f"{det[14]:.4f}", (x, y + 12),
                    cv2.FONT_HERSHEY_DUPLEX, 0.5, text_color)
        for idx, (lx, ly) in enumerate(det[4:14].reshape(5, 2).astype(np.int32)):
            cv2.circle(out, (int(lx), int(ly)), 2, LANDMARK_COLORS[idx], 2)
    return out


def _track_color(tid: int):
    rng = np.random.RandomState(tid * 7919 + 13)
    return tuple(int(c) for c in rng.randint(60, 255, 3))


def visualize_tracks(image_bgr, tracks, probs: Optional[dict] = None):
    """Draw live tracks: per-id colored box + id (+ latest deepfake prob)."""
    import cv2

    out = image_bgr.copy()
    for tr in tracks:
        x1, y1, x2, y2 = np.asarray(tr.tlbr[:4]).astype(np.int32)
        col = _track_color(tr.track_id)
        cv2.rectangle(out, (x1, y1), (x2, y2), col, 2)
        label = f"id {tr.track_id}"
        if probs and tr.track_id in probs:
            label += f"  p={probs[tr.track_id]:.2f}"
        cv2.putText(out, label, (x1, max(12, y1 - 6)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, col, 2)
    return out


def draw_dense_landmarks(image_bgr, pts, color=(0, 200, 255), copy=True):
    """Scatter a [N, 2] dense landmark set (FaceMesh layout). Returns an
    annotated copy like the sibling visualize_* helpers (pass ``copy=False``
    to draw onto ``image_bgr`` in place)."""
    import cv2

    out = image_bgr.copy() if copy else image_bgr
    for x, y in np.asarray(pts, np.int32):
        cv2.circle(out, (int(x), int(y)), 1, color, -1)
    return out


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="annotate detections on image/video")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--conf", type=float, default=0.6)
    ap.add_argument("--det_size", type=int, default=320)
    ap.add_argument("--track", action="store_true",
                    help="run ByteTrack and color boxes per id")
    ap.add_argument("--dense_landmarks", action="store_true",
                    help="overlay the 478-pt dense landmarker per face")
    ap.add_argument("--max_frames", type=int, default=None)
    args = ap.parse_args(argv)

    import cv2

    from ..models.yunet import YuNetTPU

    det = YuNetTPU(conf_threshold=args.conf)
    lm = None
    if args.dense_landmarks:
        from ..models.facemesh import DenseLandmarker

        lm = DenseLandmarker.pretrained()
    tracker = None
    if args.track:
        from ..track.byte_tracker import ByteTracker

        tracker = ByteTracker(track_thresh=0.5, match_thresh=0.8,
                              track_buffer=30, split_low_scores=False)

    from ..models.yunet import detect_scaled

    def annotate(frame_bgr):
        rows = detect_scaled(det, frame_bgr, args.det_size)
        if tracker is not None:
            # feed empty frames too: the tracker ages tracked→lost→removed
            # by frame count, so a detection gap must still tick frame_id
            # (else a new face later IoU-matches a stale box and inherits
            # the dead track's id)
            tlbr = (np.stack([rows[:, 0], rows[:, 1], rows[:, 0] + rows[:, 2],
                              rows[:, 1] + rows[:, 3], rows[:, 14]], axis=1)
                    if rows.size else np.zeros((0, 5), np.float32))
            live = tracker.update(tlbr)
            out = visualize_tracks(frame_bgr, live)
        else:
            out = visualize_detections(frame_bgr, rows) if rows.size \
                else frame_bgr.copy()
        if lm is not None and rows.size:
            for r in rows.reshape(-1, 15):
                pts = lm(frame_bgr[:, :, ::-1],
                         (r[0], r[1], r[0] + r[2], r[1] + r[3]))
                draw_dense_landmarks(out, pts, copy=False)   # out is ours
        return out

    img = cv2.imread(args.input)
    if img is not None:                          # single image
        cv2.imwrite(args.output, annotate(img))
        print(f"annotated image → {args.output}")
        return 0

    cap = cv2.VideoCapture(args.input)
    if not cap.isOpened():
        raise FileNotFoundError(args.input)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    W = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    H = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    vw = cv2.VideoWriter(args.output, cv2.VideoWriter_fourcc(*"mp4v"),
                         fps, (W, H))
    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok or (args.max_frames is not None and n >= args.max_frames):
                break
            vw.write(annotate(frame))
            n += 1
    finally:
        cap.release()
        vw.release()
    print(f"annotated {n} frames → {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
