"""Dual-encoder training-engine tests on synthetic separable data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from stdd_tpu.models.dual_encoder import DualEncoderAU_LMK
from stdd_tpu.train.altfreeze import (
    AltFreezeCfg,
    active_mask_from_labels,
    dual_labels,
    dual_phase,
    dual_phase_active,
    i3d_alt_labels,
    i3d_phase_mask,
    masked_update,
)
from stdd_tpu.train.engine_dual import DualTrainArgs, train_dual
from stdd_tpu.train.metrics import fit_temperature, threshold_from_roc
from stdd_tpu.train.samplers import BalancedPerTechLOOSampler, BalancedPerTechSampler


def _synth(n=512, T=8, au=12, lmk=20, seed=0):
    """Fakes carry a high-frequency temporal signature in a few channels."""
    rng = np.random.RandomState(seed)
    y = (rng.rand(n) > 0.5).astype(np.float32)
    A = rng.randn(n, T, au).astype(np.float32) * 0.5
    L = rng.randn(n, T, lmk).astype(np.float32) * 0.5
    flicker = ((-1.0) ** np.arange(T))[None, :, None]  # frame-rate flicker
    A[y == 1, :, :3] += 1.2 * flicker
    L[y == 1, :, :5] += 1.2 * flicker
    techs = np.where(y == 1, rng.choice(["df", "f2f", "nt"], size=n), "real")
    dom = rng.randint(0, 3, size=n)
    return {
        "A": A, "L": L, "y": y, "dom_id": dom,
        "tech": techs.tolist(),
        "trk": np.arange(n) // 4, "vid": np.arange(n) // 8,
    }


def test_train_dual_learns():
    train = _synth(512, seed=0)
    val = _synth(128, seed=1)
    test = _synth(128, seed=2)
    model = DualEncoderAU_LMK(au_dim=12, lmk_dim=20, d_model=32, depth=1, heads=2,
                              use_dat=True, domain_classes=3)
    args = DualTrainArgs(
        epochs=4, batch=64, lr=2e-3, slerp=False, dat=True, dat_lambda=0.05,
        lam_align=0.0, lam_uniform=0.0, patience=10,
    )
    res = train_dual(model, train, val, args, test_data=test, log=lambda s: None)
    assert res["best_val_auc"] > 0.9, res["best_val_auc"]
    assert res["test"]["roc_auc"] > 0.85
    assert "video_auc" in res["test"]
    assert 0.25 <= res["temperature"] <= 20.0


def _coherent_tracks(d, T=8, seed=7):
    """Relabel so every clip of a track shares the track's label (the
    aggregated objective's natural data shape) and re-inject the signal."""
    y = (np.asarray(d["trk"]) % 2).astype(np.float32)
    rng = np.random.RandomState(seed)
    d["A"] = (rng.randn(*d["A"].shape) * 0.5).astype(np.float32)
    d["L"] = (rng.randn(*d["L"].shape) * 0.5).astype(np.float32)
    flicker = ((-1.0) ** np.arange(T))[None, :, None]
    d["A"][y == 1, :, :3] += 1.2 * flicker
    d["L"][y == 1, :, :5] += 1.2 * flicker
    d["y"] = y
    d["tech"] = ["df" if t else "real" for t in y.astype(int)]
    return d


def test_train_dual_track_aggregated_loss_learns():
    """train_agg='track': the main loss is BCE on per-track noisy-OR logits
    over each track's clips in the batch (reference engine.py:517-567)."""
    train = _coherent_tracks(_synth(512, seed=0), seed=7)
    val = _coherent_tracks(_synth(128, seed=1), seed=8)
    model = DualEncoderAU_LMK(au_dim=12, lmk_dim=20, d_model=32, depth=1,
                              heads=2, use_dat=False)
    args = DualTrainArgs(
        epochs=4, batch=64, lr=2e-3, slerp=False, dat=False,
        lam_align=0.0, lam_uniform=0.0, patience=10, train_agg="track",
    )
    res = train_dual(model, train, val, args, log=lambda s: None)
    assert res["best_val_auc"] > 0.9, res["best_val_auc"]

    # misconfiguration is loud: asking for aggregation without group ids
    bad = {k: v for k, v in train.items() if k != "trk"}
    with pytest.raises(ValueError, match="trk"):
        train_dual(model, bad, val, args, log=lambda s: None)


def test_altfreeze_phases():
    cfg = AltFreezeCfg(enabled=True, warmup_epochs=2, period=2, joint_tail=2, start_epoch=1)
    phases = [dual_phase(cfg, e, 12) for e in range(1, 13)]
    assert phases[0] == phases[1] == "joint"      # warmup
    assert phases[-1] == phases[-2] == "joint"    # tail
    assert "A" in phases and "B" in phases
    assert dual_phase_active("A") == ("au", "other")


def test_masked_update_freezes_params():
    model = DualEncoderAU_LMK(au_dim=4, lmk_dim=6, d_model=16, depth=1, heads=2)
    A = jnp.ones((2, 4, 4))
    L = jnp.ones((2, 4, 6))
    params = model.init(jax.random.PRNGKey(0), A, L)["params"]
    tx = optax.adamw(1e-2)
    opt = tx.init(params)
    labels = dual_labels(params)
    mask = active_mask_from_labels(labels, ("au", "other"))  # freeze lmk

    def loss(p):
        out = model.apply({"params": p}, A, L)
        return jnp.sum(out["bin_logits"] ** 2)

    grads = jax.grad(loss)(params)
    new_params, _ = masked_update(tx, grads, opt, params, mask)
    lmk_moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["lmk_enc"], new_params["lmk_enc"],
    )
    au_moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["au_enc"], new_params["au_enc"],
    )
    assert max(jax.tree.leaves(lmk_moved)) == 0.0
    assert max(jax.tree.leaves(au_moved)) > 0.0


def test_i3d_alt_labels():
    from stdd_tpu.config import I3DConfig
    from stdd_tpu.models.i3d import I3D

    model = I3D(cfg=I3DConfig(num_frames=4, crop_size=32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)), train=False)["params"]
    labels = i3d_alt_labels(params)
    flat = jax.tree.leaves(labels)
    assert "temporal" in flat and "spatial" in flat and "both" in flat
    # stem 5x7x7 must be 'both'
    assert labels["s1"]["pathway0_stem"]["conv"]["kernel"] == "both"
    # a-conv (Tx1x1) temporal when T>1; b-conv (1x3x3) spatial
    assert labels["s2"]["pathway0_res0"]["branch2"]["a"]["conv"]["kernel"] == "temporal"
    assert labels["s2"]["pathway0_res0"]["branch2"]["b"]["conv"]["kernel"] == "spatial"
    # phase mask alternates with step
    m0 = i3d_phase_mask(labels, jnp.asarray(0), 10)
    m1 = i3d_phase_mask(labels, jnp.asarray(10), 10)
    k = ("s2", "pathway0_res0", "branch2", "a", "conv", "kernel")
    get = lambda t: t["s2"]["pathway0_res0"]["branch2"]["a"]["conv"]["kernel"]
    assert float(get(m0)) == 1.0 and float(get(m1)) == 0.0


def test_balanced_sampler():
    labels = [0] * 50 + [1] * 60
    techs = ["real"] * 50 + ["df"] * 20 + ["f2f"] * 20 + ["nt"] * 20
    s = BalancedPerTechSampler(labels, techs, epoch_samples=60, seed_base=1)
    s.set_epoch(0)
    idx = list(iter(s))
    assert len(idx) == 60
    ys = [labels[i] for i in idx]
    assert sum(ys) == 30  # half fake
    from collections import Counter

    tech_counts = Counter(techs[i] for i in idx if labels[i] == 1)
    assert all(8 <= v <= 12 for v in tech_counts.values()), tech_counts
    # deterministic given epoch
    s.set_epoch(0)
    assert list(iter(s)) == idx


def test_loo_sampler_excludes_heldout():
    labels = [0] * 50 + [1] * 60
    techs = ["real"] * 50 + ["df"] * 20 + ["f2f"] * 20 + ["nt"] * 20
    s = BalancedPerTechLOOSampler(labels, techs, heldout="nt", epoch_samples=40)
    idx = list(iter(s))
    assert all(techs[i] != "nt" for i in idx if labels[i] == 1)
    # reals can include anything labeled 0 only
    assert all(labels[i] == 0 or techs[i] in ("df", "f2f") for i in idx)


def test_threshold_and_temperature():
    rng = np.random.RandomState(0)
    y = (rng.rand(500) > 0.5).astype(int)
    logits = 3.0 * (y - 0.5) + rng.randn(500)
    probs = 1 / (1 + np.exp(-logits))
    t, stats = threshold_from_roc(probs, y, metric="youden")
    assert 0.2 < t < 0.8 and stats["youden"] > 0.4
    t2, _ = threshold_from_roc(probs, y, target_fpr=0.05)
    assert stats["FPR"] >= 0.0
    T = fit_temperature(logits * 4.0, y)  # over-confident → T > 1
    assert T > 1.1
