"""Loss-function parity and shape-strictness tests.

The round-4 on-chip convergence run exposed a silent (B,1)x(B,) broadcast in
``bce_with_logits``: the I3D head emits [B,1] logits, the trainer passed [B]
targets, and numpy-style broadcasting turned the loss into a (B,B) matrix
whose gradient trains the model to predict the batch BASE RATE (AUC ~0.5
after 1350 separable-data steps). torch's binary_cross_entropy_with_logits
raises on that mismatch — these tests pin the torch semantics (oracle
parity, trailing-singleton squeeze, no silent broadcast) so it cannot
regress.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stdd_tpu.train.losses import bce_with_logits, binary_focal_loss


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_bce_matches_torch_oracle():
    logits = _rand((16,), 1) * 3
    targets = (_rand((16,), 2) > 0).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    assert abs(ours - ref) < 1e-6


def test_bce_pos_weight_matches_torch_oracle():
    logits = _rand((32,), 3) * 2
    targets = (_rand((32,), 4) > 0.3).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                 pos_weight=2.5))
    ref = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets),
        pos_weight=torch.tensor(2.5)))
    assert abs(ours - ref) < 1e-6


def test_bce_squeezes_dense1_head_logits():
    """[B,1] logits (a Dense(1) head) against [B] targets must equal the
    squeezed call — NOT a (B,B) broadcast."""
    logits = _rand((8, 1), 5)
    targets = (_rand((8,), 6) > 0).astype(np.float32)
    a = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    b = float(bce_with_logits(jnp.asarray(logits[:, 0]), jnp.asarray(targets)))
    assert a == b
    ref = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits[:, 0]), torch.from_numpy(targets)))
    assert abs(a - ref) < 1e-6


def test_bce_rejects_true_shape_mismatch():
    with pytest.raises(ValueError, match="must match"):
        bce_with_logits(jnp.zeros((8, 2)), jnp.zeros((8,)))
    with pytest.raises(ValueError, match="must match"):
        bce_with_logits(jnp.zeros((8,)), jnp.zeros((4,)))


def test_focal_squeezes_dense1_head_logits():
    logits = _rand((8, 1), 7)
    targets = (_rand((8,), 8) > 0).astype(np.float32)
    a = float(binary_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    b = float(binary_focal_loss(jnp.asarray(logits[:, 0]),
                                jnp.asarray(targets)))
    assert a == b
    # scalar, not a silently-averaged (B,B) matrix: perturbing ONE sample's
    # logit must change the loss by ~1/B of the per-sample delta, which the
    # base-rate broadcast destroys
    logits2 = logits.copy()
    logits2[0, 0] += 5.0
    c = float(binary_focal_loss(jnp.asarray(logits2), jnp.asarray(targets)))
    assert c != a


def test_i3d_train_step_loss_is_per_sample():
    """End-to-end pin on the trainer wiring: the jitted AltFreezing step's
    reported loss must equal the mean per-sample BCE of its own logits."""
    import jax

    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.i3d import I3D
    from stdd_tpu.train.engine_i3d import I3DTrainArgs, init_i3d_training

    B, T, S = 4, 8, 32
    model = I3D(cfg=I3DConfig(num_frames=T, crop_size=S), dtype=jnp.float32)
    targs = I3DTrainArgs(base_lr=0.01, max_epoch=2, warmup_epochs=0.0,
                         warmup_start_lr=0.01, alter_freq=5,
                         steps_per_epoch=4, seed=0)
    state, step_fn, _ = init_i3d_training(model, targs,
                                          jnp.zeros((1, T, S, S, 3)))
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(jax.random.PRNGKey(1), (B, T, S, S, 3))
    y = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    # recompute what the step SHOULD report from the same forward
    out, _ = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         clips, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.fold_in(rng, 0)})
    per = np.asarray(jax.nn.log_sigmoid(out[:, 0]))
    want = float(np.mean(-(np.asarray(y) * per
                           + (1 - np.asarray(y))
                           * np.asarray(jax.nn.log_sigmoid(-out[:, 0])))))
    _, m = step_fn(state, clips, y, rng)
    assert abs(float(m["loss"]) - want) < 1e-5
