"""One honest MFU number (VERDICT r4 weak #7 / ask #5).

PERF.md has per-stage TF/s and ms/clip but never states utilization against
the chip's bf16 peak — the single number that says how much serving headroom
remains. This measures, on the current backend:

- the SERVING forward (I3D-R50, production stem layout s2d+t2, bf16,
  B=8 x 32 x 224^2 — the bench's clip-scoring program), and
- the TRAIN step (AltFreezing masked update, BN mutation, optimizer),

computing analytical FLOPs via XLA cost analysis (the repo's fvcore-style
flop utility, ``utils/misc.flop_count`` — reference analogue
slowfast/utils/misc.py:115 get_model_stats) and wall time by honest host
fetch (block_until_ready lies through the relay). MFU = flops / time /
peak; peak defaults to the TPU v5e bf16 rate (197 TFLOP/s).

Usage:  timeout 1200 python scripts/measure_mfu.py [--smoke] [--reps 8]
Prints one JSON line; paste the result into docs/PERF.md.
"""

import argparse
import json
import sys
import time

import numpy as np


def _time_fetch(fn, fetch, reps: int) -> float:
    """Median seconds over ``reps`` calls, each materialized via ``fetch``."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config on CPU — validates the harness only")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="bf16 peak of the target chip (TPU v5e: 197)")
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

    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.i3d import I3D
    from stdd_tpu.train.engine_i3d import I3DTrainArgs, init_i3d_training
    from stdd_tpu.utils.misc import flop_count

    on_tpu = jax.devices()[0].platform != "cpu"
    if args.smoke:
        B, serve_cfg = 2, I3DConfig(num_frames=8, crop_size=64)
        train_cfg, dtype = serve_cfg, jnp.float32
    else:
        B = args.batch
        # serving layout: exact same math, MXU-friendly packed stem —
        # the program bench.py times (see ClipScorer / PERF.md)
        serve_cfg = I3DConfig(s2d_stem=True, stem_t2=True)
        # the trainer's layout (stem_t2 is eval-only; run_i3d uses s2d)
        train_cfg, dtype = I3DConfig(s2d_stem=True), jnp.bfloat16

    rng = np.random.RandomState(0)
    shape = (B, serve_cfg.num_frames, serve_cfg.crop_size, serve_cfg.crop_size, 3)
    clips = jnp.asarray(rng.randn(*shape).astype(np.float32))
    rows = []

    # -- serving forward ----------------------------------------------------
    model = I3D(cfg=serve_cfg, dtype=dtype)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1,) + shape[1:]), train=False)
    )(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    flops = flop_count(fwd, variables, clips)
    float(fwd(variables, clips).sum())        # compile + warm
    sec = _time_fetch(lambda: fwd(variables, clips),
                      lambda o: float(o.sum()), args.reps)
    rows.append({"which": "serving_forward", "batch": B,
                 "gflops_per_clip": round(flops / B / 1e9, 1) if flops else None,
                 "ms": round(1000 * sec, 2),
                 "ms_per_clip": round(1000 * sec / B, 2)})

    # -- train step ---------------------------------------------------------
    tmodel = I3D(cfg=train_cfg, dtype=dtype)
    state, step_fn, _ = init_i3d_training(
        tmodel, I3DTrainArgs(steps_per_epoch=10), clips[:1])
    targets = jnp.asarray((np.arange(B) % 2).astype(np.float32))
    key = jax.random.PRNGKey(1)
    tflops = flop_count(step_fn, state, clips, targets, key)
    state, m = step_fn(state, clips, targets, key)   # compile + warm
    float(m["loss"])

    def run_step():
        nonlocal state
        state, metrics = step_fn(state, clips, targets, key)
        return metrics

    tsec = _time_fetch(run_step, lambda m: float(m["loss"]), args.reps)
    rows.append({"which": "train_step", "batch": B,
                 "gflops_per_clip": round(tflops / B / 1e9, 1) if tflops else None,
                 "ms": round(1000 * tsec, 2),
                 "ms_per_clip": round(1000 * tsec / B, 2)})

    peak = args.peak_tflops * 1e12
    for r, fl, sc in zip(rows, (flops, tflops), (sec, tsec)):
        r["tf_per_s"] = round(fl / sc / 1e12, 1) if fl else None
        # utilization only means something against the real chip's peak
        r["mfu_pct"] = (round(100.0 * fl / (sc * peak), 1)
                        if (fl and on_tpu) else None)

    print(json.dumps({
        "metric": "mfu",
        "smoke_cpu": bool(args.smoke),
        "peak_tflops_bf16": args.peak_tflops if on_tpu else None,
        "config": {"frames": serve_cfg.num_frames, "crop": serve_cfg.crop_size,
                   "dtype": "bf16" if dtype == jnp.bfloat16 else "f32"},
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
