"""Benchmark: I3D-ResNet50 clip-scoring throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's model-side throughput on its CUDA GPU is 5.6–9.3
clips/s (BASELINE.md, demo_test summary CSVs, "model 5.6-9.3 clips/s"); we
compare against the best (9.3).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: repeat bench runs skip the (minutes-long,
# relay-remote) XLA compile.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_CLIPS_PER_S = 9.3


def main():
    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.i3d import I3D

    cfg = I3DConfig()  # production shape: 32 frames, 224^2
    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 32 if on_tpu else 1
    if not on_tpu:
        # keep the CPU fallback tractable
        import dataclasses

        cfg = dataclasses.replace(cfg, num_frames=8, crop_size=64)

    model = I3D(cfg=cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    shape = (batch, cfg.num_frames, cfg.crop_size, cfg.crop_size, 3)
    # jit the init: one fused compile instead of op-by-op dispatch
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1,) + shape[1:]), train=False))(rng)

    @jax.jit
    def fwd(v, clips):
        return model.apply(v, clips, train=False)

    # Distinct device-resident inputs each iteration; the timed section ends
    # with a host fetch of a scalar — on the axon TPU relay,
    # block_until_ready() returns before execution finishes, so only a
    # materializing fetch gives honest timings.
    gen = jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(2)]
    float(fwd(variables, xs[0]).sum())  # compile + warmup
    float(fwd(variables, xs[1]).sum())

    iters = 8 if on_tpu else 3
    times = []
    for i in range(iters):
        x = xs[i % len(xs)]
        t0 = time.perf_counter()
        float(fwd(variables, x).sum())
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median
    clips_per_s = batch / dt

    print(
        json.dumps(
            {
                "metric": "i3d_clip_throughput",
                "value": round(clips_per_s, 2),
                "unit": "clips/s (32x224x224 bf16)" if on_tpu else "clips/s (8x64x64 CPU-fallback)",
                "vs_baseline": round(clips_per_s / BASELINE_CLIPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
