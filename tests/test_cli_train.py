"""Training-CLI smoke tests: run_i3d (AltFreezing + FTCN) and run_dual end
to end on tiny synthetic clip trees (one epoch, CPU)."""

import json
import os

import numpy as np
import pytest


def _make_i3d_tree(root, n_videos=4, clips_per_track=2, T=8, size=64):
    rng = np.random.RandomState(0)
    for vi in range(n_videos):
        cls = "original" if vi % 2 == 0 else "deepfakes"
        for ci in range(clips_per_track):
            d = os.path.join(root, cls, f"v{vi}", "track_1", f"clip_{ci:05d}")
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, "images.npy"),
                    rng.randint(0, 255, (T, size, size, 3), np.uint8))


def test_run_i3d_cli_one_epoch(tmp_path):
    from stdd_tpu.train.run_i3d import main

    data = tmp_path / "clips"
    _make_i3d_tree(str(data))
    out = tmp_path / "run"
    main([
        "--data", str(data), "--out", str(out), "--clip_size", "8",
        "--crop_size", "64", "--batch", "2", "--epochs", "1",
        "--warmup_epochs", "0", "--val_ratio", "0.25",
    ])
    files = os.listdir(out)
    assert any(f.startswith("i3d_") for f in files), files
    # best-val pointer: serving must be able to pick the checkpoint
    # validation chose (capstone phase 4 reads this)
    with open(out / "best.json") as f:
        best = json.load(f)
    assert best["best_epoch"] == 0
    assert (out / best["best_ckpt"]).exists()
    assert 0.0 <= best["best_val_auc"] <= 1.0


def test_val_floor_holds_out_one_video_group(tmp_path):
    """A 4-video tree at a ratio whose per-bucket rounding yields val=[] must
    end up with a non-empty video-grouped val split (VERDICT r4 weak #4:
    the r4d smoke trained with val=0 silently, degenerating best-checkpoint
    selection to last-epoch)."""
    import glob

    from stdd_tpu.data.splits import group_by_video, make_split
    from stdd_tpu.train.run_i3d import ensure_val_floor

    data = tmp_path / "clips"
    _make_i3d_tree(str(data), n_videos=4)
    dirs = sorted(glob.glob(str(data / "**" / "track_*" / "clip_*"),
                            recursive=True))
    split = make_split(dirs, ratios=(0.85, 0.15, 0.0), seed=0)
    assert not split["val"]          # the rounding hole this guards against
    out = ensure_val_floor(split, 0.15)
    assert out["val"], "val floor must hold out at least one video group"
    # the carve stays video-grouped (full groups move, no clip overlap) and
    # covers BOTH labels so the val AUC is defined (NaN AUC would silently
    # disable the best-checkpoint pointer)
    from stdd_tpu.data.dataset import label_from_dir

    assert len(group_by_video(out["val"])) == 2
    assert {label_from_dir(d) for d in out["val"]} == {0, 1}
    assert not set(out["val"]) & set(out["train"])


def test_val_floor_fails_loudly_with_single_group(tmp_path):
    """With only one video group in train there is nothing to hold out:
    requesting validation must fail loudly, not train unvalidated."""
    import pytest

    from stdd_tpu.train.run_i3d import ensure_val_floor

    split = {"train": ["a/v0/track_1/clip_00000", "a/v0/track_1/clip_00001"],
             "val": [], "test": []}
    with pytest.raises(SystemExit, match="empty validation"):
        ensure_val_floor(split, 0.15)
    # explicit --val_ratio 0 is the sanctioned way to skip validation
    assert ensure_val_floor(dict(split), 0.0)["val"] == []


def test_run_i3d_cli_ftcn(tmp_path):
    from stdd_tpu.train.run_i3d import main

    data = tmp_path / "clips"
    _make_i3d_tree(str(data))
    out = tmp_path / "run_ftcn"
    main([
        "--data", str(data), "--out", str(out), "--clip_size", "8",
        "--crop_size", "64", "--batch", "2", "--epochs", "1",
        "--warmup_epochs", "0", "--val_ratio", "0.25", "--ftcn",
    ])
    assert any(f.startswith("i3d_") for f in os.listdir(out))


def _make_dual_tree(root, n_videos=10, clips=3, T=8):
    rng = np.random.RandomState(0)
    for vi in range(n_videos):
        cls = "original" if vi % 2 == 0 else "deepfakes"
        for ci in range(clips):
            d = os.path.join(root, cls, f"v{vi}", "track_1", f"clip_{ci:05d}")
            os.makedirs(d, exist_ok=True)
            base = 1.0 if cls == "deepfakes" else 0.0
            np.save(os.path.join(d, "au_features.npy"),
                    (rng.randn(T, 36) + base).astype(np.float32))
            np.save(os.path.join(d, "lmk_features.npy"),
                    (rng.randn(T, 132) + base).astype(np.float32))


def test_run_dual_cli_one_epoch(tmp_path):
    from stdd_tpu.train.run_dual import main

    data = tmp_path / "feats"
    _make_dual_tree(str(data))
    out = tmp_path / "run_dual"
    main([
        "--data", str(data), "--out", str(out), "--T", "8",
        "--d_model", "32", "--layers", "1", "--heads", "2",
        "--epochs", "1", "--batch", "4", "--epoch_samples", "8",
        "--patience", "2",
    ])
    files = os.listdir(out)
    assert "best.msgpack" in files or any("best" in f for f in files), files
    assert "args.json" in files, files
