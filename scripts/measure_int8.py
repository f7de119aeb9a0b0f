"""On-chip A/B of the eval-only int8 dynamic-quant conv path (I3D s3-s5).

Pending round-3 measurement: the int8 stages landed (commit 61b32a2) during
the TPU outage and have never been timed on hardware. This script times the
SAME random-weight scorer with int8 off/on — warmup first, host-fetch
timing (block_until_ready lies through the relay), best-of-N — and reports
the speedup plus the score drift the quantization introduces.

Usage:  timeout 590 python scripts/measure_int8.py [--batch 8] [--reps 5]
Prints one JSON line; paste the result into docs/PERF.md.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config on CPU — validates the harness only")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, ".")
    from bench import tpu_available

    if args.smoke or not tpu_available(120):
        import jax

        jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
        args.smoke = True

    from stdd_tpu.runtime.classifier import ClipScorer

    rng = np.random.RandomState(0)
    B, T, S = args.batch, 32, 256
    scorer_kw = {}
    if args.smoke:
        import jax.numpy as jnp

        from stdd_tpu.config import I3DConfig

        B, T, S = 2, 8, 64
        scorer_kw = dict(cfg=I3DConfig(num_frames=T, crop_size=56),
                         dtype=jnp.float32)
    crops = rng.randint(0, 255, (B, T, S, S, 3), np.uint8)
    box = np.array([S * 0.06, S * 0.06, S * 0.94, S * 0.94], np.float32)
    boxes = np.tile(box, (B, T, 1))
    lm5 = np.tile(np.array(
        [[0.31, 0.39], [0.69, 0.39], [0.50, 0.59], [0.35, 0.78], [0.65, 0.78]],
        np.float32) * S, (B, T, 1, 1))
    valid = np.ones((B,), bool)

    results = {}
    probs = {}
    for name, int8 in (("bf16", False), ("int8_s3s5", True)):
        scorer = ClipScorer.random_init(seed=0, int8=int8, **scorer_kw)
        # warmup: compile + first execution out of the timed region
        p = scorer.score(crops, boxes, lm5, valid)
        probs[name] = np.asarray(p, np.float64)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = scorer.score(crops, boxes, lm5, valid)
            float(np.asarray(out).sum())  # honest host fetch
            times.append(time.perf_counter() - t0)
        results[name] = min(times)

    drift = float(np.max(np.abs(probs["bf16"] - probs["int8_s3s5"])))
    print(json.dumps({
        "metric": "int8_s3s5_speedup",
        "bf16_ms_per_batch": round(1000 * results["bf16"], 2),
        "int8_ms_per_batch": round(1000 * results["int8_s3s5"], 2),
        "speedup_x": round(results["bf16"] / results["int8_s3s5"], 3),
        "batch": B,
        "smoke_cpu": bool(args.smoke),
        "max_prob_drift": round(drift, 5),
    }))


if __name__ == "__main__":
    main()
