"""Serving this framework's OWN trained checkpoints.

``ClipScorer.from_jax_checkpoint`` closes the loop between the trainer
(``train.run_i3d`` → ``utils.checkpoint.save_checkpoint`` msgpack pytrees)
and every serving surface (harness/app/demo CLIs via ``--jax_ckpt``) —
the reference's equivalent is serving a ModelBase epoch checkpoint
(model/_base.py:39). The synth end-to-end capstone
(scripts/run_synth_e2e.py) exercises the full path; these tests pin the
load semantics."""

import numpy as np
import pytest

from stdd_tpu.config import I3DConfig


CFG = I3DConfig(num_frames=8, crop_size=64)


def _tiny_scorer():
    import jax.numpy as jnp

    from stdd_tpu.runtime.classifier import ClipScorer

    return ClipScorer.random_init(cfg=CFG, seed=3, dtype=jnp.float32)


def _sample_batch(rng):
    T = CFG.num_frames
    crops = rng.randint(0, 255, (1, T, 96, 96, 3), np.uint8)
    boxes = np.tile(np.array([10.0, 8.0, 90.0, 92.0], np.float32), (1, T, 1))
    from stdd_tpu.ops.align import STD_POINTS_256

    lm5 = np.tile(STD_POINTS_256 * (70.0 / 256.0) + 8.0, (1, T, 1, 1)).astype(
        np.float32)
    return crops, boxes, lm5, np.array([True])


def test_from_jax_checkpoint_roundtrip(tmp_path):
    """save_checkpoint (with opt_state, as run_i3d writes) → from_jax_checkpoint
    serves bit-identical scores; the opt_state leaves are ignored."""
    import jax.numpy as jnp

    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.utils.checkpoint import save_checkpoint

    src = _tiny_scorer()
    tree = {"params": src.variables["params"],
            "batch_stats": src.variables["batch_stats"],
            "opt_state": {"momentum": np.zeros(3, np.float32)}}
    path = save_checkpoint(str(tmp_path), "i3d", 7, tree)

    dst = ClipScorer.from_jax_checkpoint(path, cfg=CFG, dtype=jnp.float32)
    crops, boxes, lm5, valid = _sample_batch(np.random.RandomState(0))
    p_src = np.asarray(src.score(crops, boxes, lm5, valid))
    p_dst = np.asarray(dst.score(crops, boxes, lm5, valid))
    np.testing.assert_array_equal(p_src, p_dst)


def test_from_jax_checkpoint_rejects_geometry_mismatch(tmp_path):
    """A checkpoint trained at another width must refuse to serve (the
    tolerant merger reports shape mismatches; serving silently-random
    weights would be a correctness trap)."""
    import jax.numpy as jnp

    from stdd_tpu.runtime.classifier import ClipScorer
    from stdd_tpu.utils.checkpoint import save_checkpoint

    src = _tiny_scorer()
    tree = {"params": src.variables["params"],
            "batch_stats": src.variables["batch_stats"]}
    path = save_checkpoint(str(tmp_path), "i3d", 1, tree)

    # a genuinely different parameter tree must raise: halving
    # width_per_group changes every channel width -> shape mismatches
    with pytest.raises(ValueError, match="does not cover"):
        ClipScorer.from_jax_checkpoint(
            path, cfg=I3DConfig(num_frames=8, crop_size=64,
                                width_per_group=32),
            dtype=jnp.float32)
