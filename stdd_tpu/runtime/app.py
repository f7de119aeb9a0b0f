"""Live-call application loop (the reference's test/app_realtime.py).

Headless-friendly: the engine consumes any frame source from
:mod:`stdd_tpu.runtime.sources`, per-frame overlays are drawn with cv2 (to a
window when a display exists, else to an optional output video), and the
meeting-level verdict logic matches the reference:

- self-view exclusion rect in normalized coords (af_realtime.py:311)
- interlocutor = largest non-self-view face (``pick_interlocutor_id``
  af_realtime.py:279)
- meeting verdict: any track with ≥128 frames whose p80 running score clears
  the threshold (app_realtime.py:75 decide_meeting_fake)
- per-track hysteresis overlay colors (0.75/0.65)

CLI: ``python -m stdd_tpu.runtime.app --source video.mp4 [--ckpt CKPT]``.
"""

from __future__ import annotations

import argparse
import collections
import time
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from ..config import PipelineConfig
from .engine import StreamingEngine
from .scoring import decide_meeting_fake


def in_exclude_rect(box, H: int, W: int, rect: Tuple[float, float, float, float]) -> bool:
    """Box center inside the normalized self-view rect (af_realtime.py:311)."""
    x1, y1, x2, y2 = box
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    rx1, ry1, rx2, ry2 = rect
    return (rx1 * W <= cx <= rx2 * W) and (ry1 * H <= cy <= ry2 * H)


def pick_interlocutor(
    last_boxes: Dict[int, np.ndarray], H: int, W: int,
    exclude_rect: Tuple[float, float, float, float] = (0.70, 0.70, 1.00, 1.00),
) -> Optional[int]:
    """Largest face outside the self-view; falls back to largest overall
    (af_realtime.py:279)."""
    if not last_boxes:
        return None
    cand = [
        (tid, (b[2] - b[0]) * (b[3] - b[1]))
        for tid, b in last_boxes.items()
        if not in_exclude_rect(b, H, W, exclude_rect)
    ]
    if not cand:
        cand = [(tid, (b[2] - b[0]) * (b[3] - b[1])) for tid, b in last_boxes.items()]
    return max(cand, key=lambda t: t[1])[0]


class RealtimeApp:
    """Engine + running-score bookkeeping + meeting verdict + overlay."""

    def __init__(
        self,
        engine: StreamingEngine,
        threshold: float = 0.362,
        exclude_rect: Tuple[float, float, float, float] = (0.70, 0.70, 1.00, 1.00),
        decision_min_frames: int = 128,
        decision_percentile: float = 80.0,
    ):
        self.engine = engine
        self.threshold = threshold
        self.exclude_rect = exclude_rect
        self.decision_min_frames = decision_min_frames
        self.decision_percentile = decision_percentile
        self.frames_seen = 0

    @property
    def running_scores(self) -> Dict[int, list]:
        """Per-track clip scores — read straight from the engine (which
        already accumulates every harvested score); a second copy here
        could silently diverge when a peer thread harvests between steps."""
        return self.engine.track_clip_scores

    def step(self, frame_bgr: np.ndarray):
        results = self.engine.step(frame_bgr)
        self.frames_seen += 1
        return results

    def flush(self):
        """Drain in-flight async batches into the running scores."""
        return self.engine.flush()

    @property
    def last_boxes(self) -> Dict[int, np.ndarray]:
        return {
            t.track_id: t.tlbr
            for t in self.engine.tracker.tracked
            if t.is_activated
        }

    def meeting_verdict(self) -> Tuple[bool, bool]:
        """(any track has enough evidence, meeting judged fake)."""
        frames = dict(self.engine.track_frames)
        ready = any(
            n >= self.decision_min_frames and self.running_scores.get(t)
            for t, n in frames.items()
        )
        fake = decide_meeting_fake(
            self.running_scores, frames, self.threshold,
            self.decision_min_frames, self.decision_percentile,
        )
        return ready, fake

    def draw_overlay(self, frame_bgr: np.ndarray) -> np.ndarray:
        import cv2

        out = frame_bgr.copy()
        H, W = out.shape[:2]
        inter = pick_interlocutor(self.last_boxes, H, W, self.exclude_rect)
        for tid, box in self.last_boxes.items():
            x1, y1, x2, y2 = np.rint(box).astype(int)
            fake = self.engine.hysteresis.fake.get(tid, False)
            color = (0, 0, 255) if fake else (0, 255, 0)
            cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
            scores = self.running_scores.get(tid, [])
            label = f"id{tid}"
            if scores:
                label += f" {scores[-1]:.2f}"
            if tid == inter:
                label += " *"
            cv2.putText(out, label, (x1, max(12, y1 - 6)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        ready, fake = self.meeting_verdict()
        verdict = "FAKE" if (ready and fake) else ("REAL" if ready else "...")
        cv2.putText(out, f"meeting: {verdict}", (8, 22),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                    (0, 0, 255) if verdict == "FAKE" else (0, 255, 0), 2)
        return out


def run_loop(
    app: RealtimeApp,
    frames: Iterable[np.ndarray],
    show: bool = False,
    out_video: Optional[str] = None,
    on_frame=None,
) -> Tuple[bool, bool]:
    """Drive the app over a frame source; returns the final meeting verdict
    (app_realtime.py:96 run_loop, minus the Windows window plumbing)."""
    import cv2

    writer = None
    try:
        for frame in frames:
            app.step(frame)
            if show or out_video or on_frame:
                overlay = app.draw_overlay(frame)
                if on_frame:
                    on_frame(overlay)
                if out_video:
                    if writer is None:
                        h, w = overlay.shape[:2]
                        writer = cv2.VideoWriter(
                            out_video, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h)
                        )
                    writer.write(overlay)
                if show:
                    cv2.imshow("stdd_tpu", overlay)
                    if (cv2.waitKey(1) & 0xFF) in (27, ord("q")):
                        break
        app.flush()
        return app.meeting_verdict()
    finally:
        if writer is not None:
            writer.release()


def main(argv=None):
    from ..utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True,
                    help="video path | 'webcam[:N]' | 'screen' (X11 full "
                         "screen) | 'screen:TITLE' (largest window whose "
                         "title contains TITLE, e.g. screen:Teams)")
    ap.add_argument("--capture_hz", type=float, default=8.0,
                    help="screen-capture pacing (win_capture.py target_hz)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--jax_ckpt", default=None,
                    help="msgpack checkpoint trained by stdd_tpu.train.run_i3d")
    ap.add_argument("--threshold", type=float, default=0.362)
    ap.add_argument("--clip_size", type=int, default=32)
    ap.add_argument("--stride", type=int, default=30)
    ap.add_argument("--detect_every", type=int, default=4)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--out_video", default=None)
    ap.add_argument("--upload_format", default="rgb", choices=["rgb", "yuv420"],
                    help="crop upload format; yuv420 halves host->device bytes")
    ap.add_argument("--int8", action="store_true",
                    help="int8 dynamic-quant convs for the wide I3D stages "
                         "(s3-s5); scores shift by the quantization error")
    ap.add_argument("--model_crop", type=int, default=None,
                    help="crop size the --jax_ckpt was trained at (default: "
                         "the checkpoint's sidecar metadata, else 224)")
    ap.add_argument("--no_warmup", dest="warmup", action="store_false",
                    help="skip the startup pre-compile of scorer batch shapes")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the run into DIR "
                         "(open with tensorboard/xprof)")
    ap.add_argument("--max_batch_wait", type=int, default=None,
                    help="ship a partial clip batch after this many frames "
                         "(default: stride — a 1-face call must not wait for "
                         "a full batch to see its first score); <=0 disables")
    ap.add_argument("--no_stagger", dest="stagger", action="store_false",
                    help="disable per-track window-phase staggering (on by "
                         "default: co-appearing faces spread their stride "
                         "ticks so n faces never dispatch n windows at once)")
    ap.add_argument("--early_window", type=float, default=0.0, metavar="FRAC",
                    help="dispatch one provisional window per new track once "
                         "ceil(clip_size*FRAC) frames are buffered (padded "
                         "with the newest frame, TEST2.py:358 semantics) — "
                         "the first verdict lands in ~FRAC*clip_size frames "
                         "instead of a full clip; 0 disables (default)")
    args = ap.parse_args(argv)

    from ..models.yunet import YuNetTPU
    from .classifier import ClipScorer
    from . import sources

    kw = dict(upload_format=args.upload_format, int8=args.int8)
    if args.ckpt and args.jax_ckpt:
        raise SystemExit("--ckpt and --jax_ckpt are mutually exclusive")
    if args.ckpt:
        scorer = ClipScorer.from_torch_checkpoint(args.ckpt, **kw)
    elif args.jax_ckpt:
        import os

        from ..config import I3DConfig

        # geometry: --model_crop wins; else the checkpoint's sidecar
        # metadata (cfg=None); else the legacy 224 default (ADVICE r4 #2)
        cfg = None
        if args.model_crop:
            cfg = I3DConfig(num_frames=args.clip_size,
                            crop_size=args.model_crop)
        elif not os.path.exists(args.jax_ckpt + ".json"):
            cfg = I3DConfig(num_frames=args.clip_size)
        scorer = ClipScorer.from_jax_checkpoint(args.jax_ckpt, cfg=cfg, **kw)
    else:
        scorer = ClipScorer.random_init(**kw)
    det = YuNetTPU(conf_threshold=0.6)

    def detect_fn(frame_bgr):
        from ..models.yunet import detect_scaled

        return detect_scaled(det, frame_bgr, 320)

    cfg = PipelineConfig(
        clip_size=args.clip_size, stride=args.stride,
        detect_every=args.detect_every, threshold=args.threshold,
    )
    # flag unset → pass the engine's "stride" sentinel through: it resolves
    # to 0 (ship immediately) in device-ring mode, where window dispatches
    # carry no pixels — materializing args.stride here would add up to a
    # stride (~1 s at 30 fps) of avoidable window latency on TPU
    if args.max_batch_wait is None:
        wait = "stride"
    else:
        wait = args.max_batch_wait if args.max_batch_wait > 0 else None
    engine = StreamingEngine(
        scorer, detect_fn, cfg=cfg,
        max_batch_wait_frames=wait,
        stagger_windows=args.stagger,
        early_window_frac=args.early_window,
    )
    if args.warmup:
        # pre-compile the scorer for every batch capacity the engine can
        # dispatch; otherwise the first clips of a live call wait on XLA
        import jax as _jax

        if _jax.devices()[0].platform != "cpu":
            print("warming up scorer...")
            engine.warmup()
    app = RealtimeApp(engine, threshold=args.threshold)

    if args.source.startswith("webcam"):
        idx = int(args.source.split(":")[1]) if ":" in args.source else 0
        frames = sources.iter_webcam(idx, args.max_frames)
    elif args.source == "screen" or args.source.startswith("screen:"):
        title = args.source.split(":", 1)[1] if ":" in args.source else None
        frames = sources.iter_screen(
            window_title=(title,) if title else None,
            target_hz=args.capture_hz, max_frames=args.max_frames,
        )
    else:
        frames = sources.iter_video_file(args.source, max_frames=args.max_frames)

    import contextlib

    import jax as _jax

    prof = (_jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    with prof:
        ready, fake = run_loop(app, frames, show=args.show, out_video=args.out_video)
    print(f"meeting verdict: ready={ready} fake={fake}")


if __name__ == "__main__":
    main()
