"""On-chip A/B of the eval-only int8 dynamic-quant conv path (I3D s3-s5).

VERDICT r3 #2: the int8 stages landed during the TPU outage and were never
timed on hardware. This sweeps the serving matrix — batch {8, 32} x upload
{rgb, yuv420} (production stems auto-on) — timing the SAME random-weight
scorer with int8 off/on. Inputs are pre-uploaded to the device so the A/B
isolates the compute the quantization changes (upload is identical in both
arms and, through the axon relay, would otherwise dominate). Timing is by
host fetch of the [B] probs (block_until_ready lies through the relay),
best-of-N. Reports per-config speedup plus the score drift.

Usage:  timeout 2400 python scripts/measure_int8.py [--reps 5]
Prints one JSON line; paste the result into docs/PERF.md.
"""

import argparse
import json
import time

import numpy as np


def _inputs(rng, B, T, S, yuv420: bool):
    crops = rng.randint(0, 255, (B, T, S, S, 3), np.uint8)
    if yuv420:
        import cv2

        planar = np.empty((B, T, S * 3 // 2, S), np.uint8)
        for b in range(B):
            for t in range(T):
                planar[b, t] = cv2.cvtColor(crops[b, t], cv2.COLOR_RGB2YUV_I420)
        crops = planar
    box = np.array([S * 0.06, S * 0.06, S * 0.94, S * 0.94], np.float32)
    boxes = np.tile(box, (B, T, 1))
    lm5 = np.tile(np.array(
        [[0.31, 0.39], [0.69, 0.39], [0.50, 0.59], [0.35, 0.78], [0.65, 0.78]],
        np.float32) * S, (B, T, 1, 1))
    valid = np.ones((B,), bool)
    return crops, boxes, lm5, valid


def _time_config(scorer, dev_inputs, reps: int) -> tuple:
    """(best_seconds, probs) — warmup compile+run first, then best-of-reps
    with an honest host fetch (score() materializes the [B] probs)."""
    probs = np.asarray(scorer.score(*dev_inputs), np.float64)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        scorer.score(*dev_inputs)
        times.append(time.perf_counter() - t0)
    return min(times), probs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--uploads", nargs="+", default=["rgb", "yuv420"])
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config on CPU — validates the harness only")
    args = ap.parse_args()

    import sys

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

    from stdd_tpu.runtime.classifier import ClipScorer

    T, S = 32, 256
    scorer_kw = {}
    if args.smoke:
        from stdd_tpu.config import I3DConfig

        T, S = 8, 64
        args.batches = [2]
        args.uploads = ["rgb"]
        scorer_kw = dict(cfg=I3DConfig(num_frames=T, crop_size=S),
                         dtype=jnp.float32)

    rng = np.random.RandomState(0)
    rows = []
    for upload in args.uploads:
        scorers = {
            name: ClipScorer.random_init(
                seed=0, int8=int8, upload_format=upload, **scorer_kw)
            for name, int8 in (("bf16", False), ("int8_s3s5", True))
        }
        for B in args.batches:
            host = _inputs(rng, B, T, S, yuv420=(upload == "yuv420"))
            dev = tuple(jnp.asarray(a) for a in host)
            np.asarray(dev[0][0, 0])  # force the upload out of the timed region
            r = {"upload": upload, "batch": B}
            probs = {}
            for name, scorer in scorers.items():
                best, probs[name] = _time_config(scorer, dev, args.reps)
                r[f"{name}_ms"] = round(1000 * best, 2)
            r["speedup_x"] = round(r["bf16_ms"] / r["int8_s3s5_ms"], 3)
            r["max_prob_drift"] = round(
                float(np.max(np.abs(probs["bf16"] - probs["int8_s3s5"]))), 5)
            rows.append(r)
            print(json.dumps({"progress": r}), file=sys.stderr)

    print(json.dumps({
        "metric": "int8_s3s5_ab",
        "smoke_cpu": bool(args.smoke),
        "clip": [T, S],
        "reps_best_of": args.reps,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
