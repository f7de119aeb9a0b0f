"""Device mesh and sharding helpers.

The reference's distributed stack (NCCL process groups + DDP + NaiveSyncBN;
``slowfast/utils/distributed.py``, ``model/_base.py:110``) collapses, on TPU,
into: one ``jax.sharding.Mesh``, ``NamedSharding`` annotations, and XLA-inserted
collectives over ICI. Sync-BatchNorm is free under GSPMD: a ``jnp.mean`` over a
batch axis sharded across the mesh IS the global (cross-replica) mean.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = -1,
    model: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """Build a 2D (data, model) mesh. ``data=-1`` takes all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (data_axis, model_axis))


def data_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a host batch onto the mesh, sharded along axis 0."""
    s = data_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def make_sharded_score_fn(scorer, mesh: Mesh, data_axis: str = "data"):
    """Data-parallel inference serving: each device runs the FULL fused
    align+score program on its shard of the clip batch via ``shard_map`` —
    the TPU-native equivalent of serving the reference's classifier behind a
    DDP/NCCL replica pool (model/_base.py:110).

    ``shard_map`` (not plain GSPMD jit) because the align path contains a
    Pallas/Mosaic kernel, which XLA cannot auto-partition; per-shard local
    execution sidesteps partitioning entirely (pure DP inference has no
    cross-device collectives). Weights are passed per call, so loading a new
    checkpoint into ``scorer`` takes effect immediately, and the scorer
    object is not mutated.

    → ``score(crops, boxes, lm5, valid) -> probs [B]`` where B must be a
    multiple of the data-axis size.
    """
    spec_b = P(data_axis)

    def local(variables, crops, boxes, lm5, valid):
        return scorer._score_impl(crops, boxes, lm5, valid, variables=variables)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), spec_b, spec_b, spec_b, spec_b),
        out_specs=spec_b,
        check_vma=False,
    ))

    def score(crops, boxes, lm5, valid):
        n_data = mesh.shape[data_axis]
        assert crops.shape[0] % n_data == 0, (
            f"batch {crops.shape[0]} not divisible by data axis {n_data}")
        return np.asarray(fn(scorer.variables, crops, boxes, lm5, np.asarray(valid)))

    return score
