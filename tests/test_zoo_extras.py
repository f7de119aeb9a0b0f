"""SlowFast/Nonlocal, Vox data plumbing, MoE fusion training, misc utils."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.data.vox import VoxLmkDataset, build_index, collate_pad, time_warp
from stdd_tpu.models.slowfast import FuseFastToSlow, Nonlocal, SlowFast
from stdd_tpu.train.engine_fusion import align_scores, train_moe
from stdd_tpu.utils.misc import (
    UtilizationSampler,
    flop_count,
    params_count,
    sample_subset,
    skip_shard_split,
)


def test_slowfast_forward():
    cfg = I3DConfig(num_frames=16, crop_size=64)
    m = SlowFast(cfg=cfg, alpha=4, beta_inv=8)
    x = jnp.zeros((1, 16, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 1)
    n = params_count(v["params"])
    assert 25e6 < n < 40e6  # dual-pathway R50 scale


def test_nonlocal_block():
    m = Nonlocal(dim_inner=8, instantiation="softmax")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == x.shape
    # zero-init final BN scale → identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
    m2 = Nonlocal(dim_inner=8, instantiation="dot_product", pool_size=(1, 2, 2))
    v2 = m2.init(jax.random.PRNGKey(1), x, train=False)
    assert m2.apply(v2, x, train=False).shape == x.shape


def test_vox_index_and_dataset(tmp_path):
    rng = np.random.RandomState(0)
    for sp in ("id001", "id002", "id003", "id004"):
        for c in range(2):
            d = tmp_path / sp / f"clip{c}"
            os.makedirs(d)
            np.save(d / "lmk_features.npy", rng.randn(20, 132).astype(np.float32))
    idx = build_index(str(tmp_path), val_ratio=0.25, seed=0)
    assert len(idx["train"]) + len(idx["val"]) == 8
    train_sp = {os.path.relpath(f, tmp_path).split(os.sep)[0] for f in idx["train"]}
    val_sp = {os.path.relpath(f, tmp_path).split(os.sep)[0] for f in idx["val"]}
    assert not (train_sp & val_sp)  # speaker-disjoint

    ds = VoxLmkDataset(idx["train"], T=16, is_train=True)
    X, lengths = next(iter(ds.batches(2)))
    assert X.shape == (2, 16, 132) and (lengths <= 16).all()

    # time-warp keeps dimensionality
    w = time_warp(rng.randn(20, 4).astype(np.float32), rng)
    assert w.shape[1] == 4 and w.shape[0] >= 4


def test_collate_pad():
    seqs = [np.ones((3, 2), np.float32), np.ones((7, 2), np.float32)]
    X, lengths = collate_pad(seqs, T=5)
    assert X.shape == (2, 5, 2)
    assert list(lengths) == [3, 5]
    assert X[0, 3:].sum() == 0


def test_moe_fusion_training(tmp_path):
    rng = np.random.RandomState(0)
    n = 200
    y = (rng.rand(n) > 0.5).astype(np.float32)
    # RGB expert is good, dual expert mediocre → gate should favor RGB
    z_rgb = 3.0 * (y - 0.5) + rng.randn(n) * 0.5
    z_dual = 0.8 * (y - 0.5) + rng.randn(n) * 1.0
    res = train_moe(z_rgb.astype(np.float32), z_dual.astype(np.float32), y,
                    epochs=150, log=lambda s: None)
    assert res["auc_fused"] >= res["auc_dual"]
    assert res["auc_fused"] >= 0.9

    # csv alignment join
    import csv

    p = tmp_path / "per_video.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["video_path", "video_score", "gt_label"])
        w.writeheader()
        w.writerow({"video_path": "/x/a.mp4", "video_score": 0.9, "gt_label": 1})
        w.writerow({"video_path": "/x/b.mp4", "video_score": 0.2, "gt_label": 0})
        w.writerow({"video_path": "/x/c.mp4", "video_score": 0.5, "gt_label": 1})
    zr, zd, yy, keys = align_scores(str(p), {"a": 0.8, "b": 0.3})
    assert keys == ["a", "b"] and len(zr) == 2 and yy.tolist() == [1.0, 0.0]


def test_misc_utils(tmp_path):
    assert skip_shard_split(list(range(10)), 0, 3) == [0, 3, 6, 9]
    assert skip_shard_split(list(range(10)), 2, 3) == [2, 5, 8]

    f = flop_count(lambda x: x @ x, jnp.ones((64, 64)))
    assert f is None or f > 64 * 64 * 64  # ≥ 2MNK/2

    with UtilizationSampler(period_sec=0.01) as s:
        _ = sum(range(200000))
        import time

        time.sleep(0.05)
    assert "rss_mb_max" in s.summary()

    # subset sampler over a fake tree
    src = tmp_path / "src"
    for cls, n in (("real", 3), ("fake", 3)):
        os.makedirs(src / cls, exist_ok=True)
        for i in range(n):
            (src / cls / f"v{i}.mp4").write_bytes(b"x")
    counts = sample_subset(str(src), str(tmp_path / "dst"), n_per_class=2)
    assert counts == {"real": 2, "fake": 2}
    assert len(list((tmp_path / "dst" / "real").iterdir())) == 2
