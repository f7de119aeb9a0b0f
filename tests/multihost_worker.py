"""Multi-host worker: one process of a 2-process jax.distributed CPU job.

Run as ``python tests/multihost_worker.py <process_id> <port>``; each process
exposes 4 virtual CPU devices (global mesh = 8), joins the coordinator on
localhost, runs ONE data-parallel masked-AltFreezing I3D train step with its
process-local half of the global batch (``global_batch_from_local``), and
prints ``MULTIHOST loss=<value>``.

The same ``run_one_step`` is importable for the single-process 8-device
reference run, so the cross-process comparison in tests/test_multihost.py
is exact-program-identical (reference analogue:
slowfast/utils/distributed.py:56 init_process_group + root_setting.yaml:14
NUM_SHARDS)."""

import os
import sys


def _force_cpu(n_local_devices: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")


def run_one_step():
    """One sharded train step over ALL visible devices (global batch 16,
    deterministic params/batch). Returns the scalar loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.i3d import I3D
    from stdd_tpu.parallel.mesh import (
        global_batch_from_local, make_mesh, process_shard)
    from stdd_tpu.train.engine_i3d import I3DTrainArgs, init_i3d_training

    devices = jax.devices()
    mesh = make_mesh(devices, data=len(devices), model=1)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    cfg = I3DConfig(num_frames=2, crop_size=16)
    model = I3D(cfg=cfg)
    args = I3DTrainArgs(base_lr=1e-3, max_epoch=1, warmup_epochs=0,
                        warmup_start_lr=1e-3, steps_per_epoch=2, alter_freq=2)
    sample = jnp.zeros((1, cfg.num_frames, cfg.crop_size, cfg.crop_size, 3))
    state, step_fn, _ = init_i3d_training(model, args, sample)
    state = jax.device_put(state, repl)

    B = 16
    rng_np = np.random.RandomState(0)
    clips_all = rng_np.rand(B, cfg.num_frames, cfg.crop_size, cfg.crop_size,
                            3).astype(np.float32)
    labels_all = (rng_np.rand(B) > 0.5).astype(np.float32)

    # each process feeds only the rows its OWN devices hold (global device
    # order = process-major), exactly the production input path
    pi, pc = jax.process_index(), jax.process_count()
    rows_per_proc = B // pc
    lo = pi * rows_per_proc
    local = {"clips": clips_all[lo:lo + rows_per_proc],
             "labels": labels_all[lo:lo + rows_per_proc]}
    gbatch = global_batch_from_local(mesh, local)

    step = jax.jit(
        step_fn.__wrapped__ if hasattr(step_fn, "__wrapped__") else step_fn,
        in_shardings=(repl, data, data, repl),
        out_shardings=(repl, repl),
    )
    rng = jax.device_put(jax.random.PRNGKey(0), repl)
    new_state, metrics = step(state, gbatch["clips"], gbatch["labels"], rng)
    jax.block_until_ready(metrics)
    assert int(new_state.step) == 1
    # exercise process_shard too (the per-host work-list stripe)
    assert len(process_shard(list(range(10)), pi, pc)) in (5, 10)
    return float(metrics["loss"])


def main():
    process_id = int(sys.argv[1])
    port = int(sys.argv[2])
    _force_cpu(4)
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8          # 2 hosts x 4 virtual devices
    loss = run_one_step()
    print(f"MULTIHOST pid={process_id} loss={loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
