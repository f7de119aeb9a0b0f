"""First-verdict latency A/B: sub-stride provisional windows (VERDICT r3 #9).

Measures the time from a track's FIRST frame entering the engine to its
first scored verdict, with frames paced at 30 fps (a live call's arrival
rate — the buffering delay, not host speed, dominates this metric), for
``early_window_frac`` in {0 (off), 0.25, 0.5} at the realtime operating
point (clip 32, stride 30, detect_every 4; reference semantics
``TEST2.py:358-363`` short-window padding, ``af_realtime.py:351``
hysteresis unchanged — the provisional score enters the median-of-5 like
any clip score).

Usage:  timeout 1200 python scripts/measure_first_verdict.py [--reps 3]
Prints one JSON line; paste the result into docs/PERF.md.
"""

import argparse
import json
import sys
import time

import numpy as np

PACE_FPS = 30.0


def _one_rep(scorer, pipe, det, frame_hw, frac, crop_buffer, eng_kw, seed,
             root):
    """Fresh scene + engine sharing the WARM dispatch group (a new track in
    production joins a warm serving process — ring kernels and scorer
    executables are already compiled); paced stepping until the first
    verdict. Returns (frames_to_first_verdict, wall_ms) — wall clock starts
    at the first frame handed to the engine (= the face's first
    appearance)."""
    from stdd_tpu.eval.bench_scene import BenchScene
    from stdd_tpu.runtime.engine import AsyncDetector, StreamingEngine

    scene = BenchScene(frame_hw, n_faces=1, seed=seed)
    eng = StreamingEngine(
        scorer, AsyncDetector(lambda f: scene.detect(det, f)), cfg=pipe,
        crop_buffer=crop_buffer, early_window_frac=frac,
        share_dispatch_from=root, **eng_kw,
    )
    try:
        t0 = time.perf_counter()
        period = 1.0 / PACE_FPS
        for i in range(20 * pipe.clip_size):
            target = t0 + i * period
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
            if eng.step(scene.frame(i)):
                return i + 1, 1000.0 * (time.perf_counter() - t0)
        return None, None
    finally:
        eng.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fracs", type=float, nargs="+", default=[0.0, 0.25, 0.5])
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config on CPU — validates the harness only")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import tpu_available

    if args.smoke or not tpu_available(120, attempts=3):
        import jax

        jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
        args.smoke = True

    import os

    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stdd_tpu.config import PipelineConfig
    from stdd_tpu.models.yunet import YuNetTPU
    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.runtime.engine import AsyncDetector, StreamingEngine

    # the bench's realtime operating point + detector/tracker calibration for
    # the procedural heads (bench.py BENCH_ENG_KW — renders score 0.25-0.9 on
    # the real-weights YuNet, so thresholds scale; detections are real)
    eng_kw = dict(
        q_weighting=False, q_lap_hard=0.0, start_conf=0.3,
        track_kwargs=dict(track_thresh=0.35, match_thresh=0.6,
                          track_buffer=2000, split_low_scores=False),
    )
    if args.smoke:
        from stdd_tpu.config import I3DConfig

        pipe = PipelineConfig(clip_size=8, stride=4, detect_every=4,
                              batch_clips=2, min_face_side=10)
        scorer = ClipScorer.random_init(
            cfg=I3DConfig(num_frames=8, crop_size=64), dtype=jnp.float32)
        frame_hw, crop_buffer = (360, 640), 128
    else:
        pipe = PipelineConfig(clip_size=32, stride=30, detect_every=4,
                              batch_clips=2, min_face_side=10)
        scorer = ClipScorer.random_init(upload_format="yuv420")
        frame_hw, crop_buffer = (1080, 1920), 256

    det = YuNetTPU(conf_threshold=0.25, top_k=32)

    # one persistent ROOT engine absorbs every XLA compile (normal and
    # padded-window programs) and stays open: each timed rep shares its
    # dispatch group, so reps measure a new track joining a WARM serving
    # process — no compiles, no kernel rebuilds in the timed region
    from stdd_tpu.eval.bench_scene import BenchScene

    scene = BenchScene(frame_hw, n_faces=1, seed=99)
    # the detector compiles on first use; do it synchronously HERE — the
    # engines' AsyncDetector is non-blocking, so without this the whole
    # root warm loop can fly by while YuNet is still compiling in the
    # detector thread and nothing downstream ever warms
    scene.detect(det, scene.frame(0))
    root = StreamingEngine(
        scorer, AsyncDetector(lambda f: scene.detect(det, f)), cfg=pipe,
        crop_buffer=crop_buffer, early_window_frac=max(args.fracs), **eng_kw)
    root.warmup()  # all pow2 batch capacities (partial batches included)
    # drive the root until a verdict actually lands: proves detector →
    # tracker → window → scorer is end-to-end compiled (incl. the early
    # padded window when max(fracs) > 0) before any timed rep starts
    for i in range(40 * pipe.clip_size):
        if root.step(scene.frame(i)):
            break
    root.flush()

    rows = []
    for frac in args.fracs:
        frames, walls = [], []
        for rep in range(args.reps):
            f, w = _one_rep(scorer, pipe, det, frame_hw, frac, crop_buffer,
                            eng_kw, seed=rep, root=root)
            if f is not None:
                frames.append(f)
                walls.append(w)
        r = {
            "early_window_frac": frac,
            "reps_ok": len(frames),
            "first_verdict_frames_median": float(np.median(frames)) if frames else None,
            "first_verdict_ms_median_30fps": round(float(np.median(walls)), 1)
            if walls else None,
        }
        rows.append(r)
        print(json.dumps({"progress": r}), file=sys.stderr)
    root.close()

    print(json.dumps({
        "metric": "first_verdict_latency",
        "smoke_cpu": bool(args.smoke),
        "pace_fps": PACE_FPS,
        "clip": [pipe.clip_size, crop_buffer],
        "stride": pipe.stride,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
