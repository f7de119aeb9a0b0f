"""I3D AltFreezing trainer + checkpoint/LR-policy tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.models.i3d import I3D
from stdd_tpu.train.engine_i3d import (
    I3DTrainArgs,
    init_i3d_training,
    make_lr_schedule,
    precise_bn_update,
)
from stdd_tpu.train.lr_policy import cosine_lr, step_decay, steps_with_relative_lrs, with_warmup
from stdd_tpu.utils.checkpoint import (
    find_last,
    load_checkpoint,
    save_checkpoint,
    tolerant_merge,
)

TINY = I3DConfig(num_frames=4, crop_size=32)


def test_lr_policies():
    pol = with_warmup(cosine_lr(0.04, 100), warmup_epochs=10, warmup_start_lr=0.01)
    assert pol(0) == pytest.approx(0.01)
    assert pol(10) == pytest.approx(0.04 * 0.5 * (np.cos(np.pi * 0.1) + 1), rel=1e-6)
    assert pol(100) == pytest.approx(0.0, abs=1e-9)
    sd = step_decay(0.04, step_size=100, gamma=0.5)
    assert sd(99) == 0.04 and sd(150) == 0.02
    # reference convention (lr_policy.py:75 get_step_index): steps carry a
    # leading zero, len(lrs) == len(steps), segment i in [steps[i],
    # steps[i+1]) uses lrs[i]
    sw = steps_with_relative_lrs(0.1, [0, 30, 60], [1.0, 0.1, 0.01], 90)
    assert sw(10) == pytest.approx(0.1) and sw(40) == pytest.approx(0.01)
    assert sw(70) == pytest.approx(0.001)   # last segment must be indexable


def test_i3d_altfreeze_training_runs_and_alternates():
    model = I3D(cfg=TINY)
    args = I3DTrainArgs(
        base_lr=1e-3, max_epoch=2, warmup_epochs=0, warmup_start_lr=1e-3,
        alter_freq=2, steps_per_epoch=4, optimizer="sgd",
    )
    sample = jnp.zeros((2, 4, 32, 32, 3))
    state, step_fn, sched = init_i3d_training(model, args, sample)

    rng = np.random.RandomState(0)
    p0 = state.params
    temporal_key = lambda p: p["s2"]["pathway0_res0"]["branch2"]["a"]["conv"]["kernel"]
    spatial_key = lambda p: p["s2"]["pathway0_res0"]["branch2"]["b"]["conv"]["kernel"]

    # iterations 0-1: temporal phase → spatial conv must stay frozen
    for i in range(2):
        clips = jnp.asarray(rng.randn(2, 4, 32, 32, 3), jnp.float32)
        y = jnp.asarray(rng.randint(0, 2, 2), jnp.float32)
        state, metrics = step_fn(state, clips, y, jax.random.PRNGKey(0))
        assert float(metrics["phase_temporal"]) == 1.0
    assert np.abs(np.asarray(spatial_key(state.params) - spatial_key(p0))).max() == 0
    assert np.abs(np.asarray(temporal_key(state.params) - temporal_key(p0))).max() > 0

    # iterations 2-3: spatial phase → now the spatial conv moves
    p2 = state.params
    for i in range(2):
        clips = jnp.asarray(rng.randn(2, 4, 32, 32, 3), jnp.float32)
        y = jnp.asarray(rng.randint(0, 2, 2), jnp.float32)
        state, metrics = step_fn(state, clips, y, jax.random.PRNGKey(0))
        assert float(metrics["phase_temporal"]) == 0.0
    assert np.abs(np.asarray(spatial_key(state.params) - spatial_key(p2))).max() > 0
    assert np.abs(np.asarray(temporal_key(state.params) - temporal_key(p2))).max() == 0
    # BN stats advanced
    assert state.step == 4


def test_precise_bn():
    model = I3D(cfg=TINY)
    args = I3DTrainArgs(steps_per_epoch=1, max_epoch=1, warmup_epochs=0)
    sample = jnp.zeros((2, 4, 32, 32, 3))
    state, _, _ = init_i3d_training(model, args, sample)
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(2, 4, 32, 32, 3) + 3.0, jnp.float32) for _ in range(3)]
    new_state = precise_bn_update(model, state, batches)
    stem_mean = np.asarray(new_state.batch_stats["s1"]["pathway0_stem"]["bn"]["mean"])
    assert np.abs(stem_mean).max() > 0.01  # moved toward true activations


def test_checkpoint_roundtrip_and_gc(tmp_path):
    tree = {"a": np.arange(4.0), "b": {"c": np.ones((2, 2))}}
    for ep in range(1, 8):
        save_checkpoint(str(tmp_path), "model", ep, tree, max_to_keep=3)
    last = find_last(str(tmp_path), "model")
    assert last[0] == 7
    kept = sorted(int(p.split("_")[-1].split(".")[0]) for p in os.listdir(tmp_path) if p.endswith(".msgpack"))
    assert kept == [5, 6, 7]
    loaded = load_checkpoint(last[1], tree)
    np.testing.assert_array_equal(loaded["a"], tree["a"])


def test_tolerant_merge():
    target = {"enc": {"w": np.zeros((2, 2)), "b": np.zeros(2)}, "head": {"w": np.zeros(3)}}
    source = {
        "module": {"enc": {"w": np.ones((2, 2)), "b": np.ones(5)}},  # b mismatched
        # head missing entirely
    }
    # flatten module prefix like the reference's prefix-stripped load
    merged, report = tolerant_merge(target, source["module"], strip_prefixes=("module",))
    np.testing.assert_array_equal(merged["enc"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["enc"]["b"], np.zeros(2))
    assert "enc/b" in report["shape_mismatch"]
    assert "head/w" in report["missing"]
