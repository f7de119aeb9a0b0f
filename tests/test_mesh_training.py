"""Multi-device training tests on the 8-device virtual CPU mesh: the CI-side
equivalent of the driver's dryrun — data-parallel training of both detectors
with sharded batches and replicated params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from stdd_tpu.config import I3DConfig
from stdd_tpu.models.dual_encoder import DualEncoderAU_LMK
from stdd_tpu.models.i3d import I3D
from stdd_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_batch
from stdd_tpu.train.engine_i3d import I3DTrainArgs, init_i3d_training
from stdd_tpu.train.step import TrainState


def test_mesh_helpers():
    mesh = make_mesh(jax.devices(), data=8, model=1)
    assert mesh.shape == {"data": 8, "model": 1}
    batch = {"x": np.ones((16, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == P("data")


def test_i3d_altfreeze_step_on_mesh():
    mesh = make_mesh(jax.devices(), data=8, model=1)
    repl = replicated(mesh)
    data = data_sharding(mesh)

    model = I3D(cfg=I3DConfig(num_frames=4, crop_size=32))
    args = I3DTrainArgs(base_lr=1e-3, max_epoch=1, warmup_epochs=0,
                        warmup_start_lr=1e-3, steps_per_epoch=2, alter_freq=2)
    state, step_fn, _ = init_i3d_training(model, args, jnp.zeros((8, 4, 32, 32, 3)))

    state = jax.device_put(state, repl)
    clips = jax.device_put(jnp.ones((16, 4, 32, 32, 3)), data)
    labels = jax.device_put(jnp.ones((16,)), data)
    rng = jax.device_put(jax.random.PRNGKey(0), repl)

    step = jax.jit(
        step_fn.__wrapped__ if hasattr(step_fn, "__wrapped__") else step_fn,
        in_shardings=(repl, data, data, repl),
        out_shardings=(repl, repl),
    )
    new_state, metrics = step(state, clips, labels, rng)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated after the update
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_batch_equals_single_device_loss():
    """Global BN/grad semantics: the data-parallel loss must equal the
    single-device loss on the same batch (GSPMD sync-BN correctness)."""
    mesh = make_mesh(jax.devices(), data=8, model=1)
    repl = replicated(mesh)
    data = data_sharding(mesh)

    model = DualEncoderAU_LMK(au_dim=4, lmk_dim=6, d_model=16, depth=1, heads=2)
    rng = np.random.RandomState(0)
    A = rng.randn(16, 4, 4).astype(np.float32)
    L = rng.randn(16, 4, 6).astype(np.float32)
    y = (rng.rand(16) > 0.5).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(A), jnp.asarray(L))["params"]

    def loss_fn(p, a, l, yy):
        out = model.apply({"params": p}, a, l)
        logits = out["bin_logits"]
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * yy + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    single = float(jax.jit(loss_fn)(params, jnp.asarray(A), jnp.asarray(L), jnp.asarray(y)))
    sharded_loss = jax.jit(
        loss_fn,
        in_shardings=(repl, data, data, data),
        out_shardings=repl,
    )
    p_r = jax.device_put(params, repl)
    multi = float(sharded_loss(
        p_r, jax.device_put(jnp.asarray(A), data),
        jax.device_put(jnp.asarray(L), data), jax.device_put(jnp.asarray(y), data),
    ))
    assert multi == pytest.approx(single, rel=1e-5)


def test_sharded_inference_matches_single_device():
    """make_sharded_score_fn over the 8-device CPU mesh reproduces the
    single-device scorer bit-for-bit (pure DP inference, params replicated)."""
    import numpy as np

    from stdd_tpu.config import I3DConfig
    from stdd_tpu.ops.align import STD_POINTS_256
    from stdd_tpu.parallel.mesh import make_mesh, make_sharded_score_fn
    from stdd_tpu.runtime.classifier import ClipScorer

    rng = np.random.RandomState(0)
    B = 8
    crops = rng.randint(0, 255, (B, 4, 96, 96, 3), np.uint8)
    boxes = np.tile(np.array([5, 5, 90, 90], np.float32), (B, 4, 1))
    lm5 = np.tile((np.asarray(STD_POINTS_256) * 0.3 + 10).astype(np.float32), (B, 4, 1, 1))
    valid = np.ones(B, bool)

    scorer = ClipScorer.random_init(cfg=I3DConfig(num_frames=4, crop_size=64),
                                    dtype=jnp.float32)
    p_single = scorer.score(crops, boxes, lm5, valid)

    mesh = make_mesh(data=8)
    score8 = make_sharded_score_fn(scorer, mesh)
    p_sharded = score8(crops, boxes, lm5, valid)
    np.testing.assert_allclose(p_sharded, p_single, atol=1e-6)

    # batch not divisible by the data axis → loud error
    try:
        score8(crops[:6], boxes[:6], lm5[:6], valid[:6])
        assert False, "expected divisibility assert"
    except AssertionError as e:
        assert "divisible" in str(e) or "batch" in str(e)


def test_sharded_serving_sees_checkpoint_swaps():
    """make_sharded_score_fn passes weights per call: loading new variables
    into the scorer takes effect without rebuilding the serve fn, and the
    scorer object is not mutated (review regression)."""
    import numpy as np

    from stdd_tpu.config import I3DConfig
    from stdd_tpu.ops.align import STD_POINTS_256
    from stdd_tpu.parallel.mesh import make_mesh, make_sharded_score_fn
    from stdd_tpu.runtime.classifier import ClipScorer

    rng = np.random.RandomState(0)
    crops = rng.randint(0, 255, (8, 4, 96, 96, 3), np.uint8)
    boxes = np.tile(np.array([5, 5, 90, 90], np.float32), (8, 4, 1))
    lm5 = np.tile((np.asarray(STD_POINTS_256) * 0.3 + 10).astype(np.float32), (8, 4, 1, 1))
    valid = np.ones(8, bool)

    scorer = ClipScorer.random_init(cfg=I3DConfig(num_frames=4, crop_size=64),
                                    dtype=jnp.float32)
    before = scorer.variables
    serve = make_sharded_score_fn(scorer, make_mesh(data=8))
    p1 = serve(crops, boxes, lm5, valid)
    assert scorer.variables is before          # no in-place mutation

    scorer.variables = jax.tree.map(lambda x: x * 0, scorer.variables)
    p0 = serve(crops, boxes, lm5, valid)
    np.testing.assert_allclose(p0, 0.5, atol=1e-6)   # sigmoid(0) everywhere
    assert float(np.abs(p1 - 0.5).max()) > 1e-4      # p1 used the real weights


def test_process_shard_math():
    """Multi-host work partitioning: disjoint, near-equal stripes whose
    union is the full list, deterministic per (index, count)."""
    from stdd_tpu.parallel.mesh import process_shard

    items = [f"clip_{i}" for i in range(103)]
    pc = 4
    shards = [process_shard(items, pi, pc) for pi in range(pc)]
    # union preserves everything, shards are disjoint
    flat = [x for s in shards for x in s]
    assert sorted(flat) == sorted(items)
    assert len(set(flat)) == len(items)
    # near-equal: max spread 1
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # deterministic
    assert process_shard(items, 2, pc) == shards[2]
    with pytest.raises(ValueError):
        process_shard(items, 4, 4)


def test_global_batch_from_local_single_process():
    from stdd_tpu.parallel.mesh import global_batch_from_local

    mesh = make_mesh(jax.devices(), data=8, model=1)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = global_batch_from_local(mesh, {"x": x})["x"]
    assert g.shape == (16, 3)
    assert g.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(g), x)


def test_run_i3d_mesh_cli_one_epoch(tmp_path):
    """--mesh trains one epoch data-parallel over the 8 virtual devices
    (global batch 8 → 1 clip per device) through the real CLI."""
    from stdd_tpu.train.run_i3d import main
    from tests.test_cli_train import _make_i3d_tree

    data = tmp_path / "clips"
    _make_i3d_tree(str(data), T=4, size=32)
    out = tmp_path / "runs"
    main([
        "--data", str(data), "--out", str(out), "--clip_size", "4",
        "--crop_size", "32", "--batch", "8", "--epochs", "1",
        "--val_ratio", "0.3", "--mesh",
    ])
    assert any(p.name.startswith("i3d") for p in out.iterdir()), list(out.iterdir())
