"""Data-layer tests: feature builders (golden vs reference), dataset tree,
splits, degradations."""

import json
import os
import sys

import numpy as np
import pytest

from stdd_tpu.data.dataset import (
    DualFeaturesClipDataset,
    ids_from_dir,
    infer_tech_from_path,
    label_from_dir,
)
from stdd_tpu.data.degrade import ClipDegrader
from stdd_tpu.data.features import (
    AU_ORDER,
    LMK_FEATURE_DIM,
    au_seq_to_features,
    compute_norm_stats,
    lmk_frame_to_features,
    lmk_seq_to_features,
    process_clip_tree,
)
from stdd_tpu.data.splits import check_no_leakage, combine_splits, make_split

REF = "/root/reference/dualrun"


def _stub_mediapipe():
    import types

    if "mediapipe" not in sys.modules:
        mp = types.ModuleType("mediapipe")
        mp.solutions = types.SimpleNamespace(
            face_mesh=types.SimpleNamespace(FaceMesh=lambda **kw: None)
        )
        sys.modules["mediapipe"] = mp


def test_lmk_features_match_reference():
    from tests.oracles.ref_i3d import use_reference_root

    use_reference_root(REF)
    _stub_mediapipe()
    from data.make_lmk_features import _frame_to_features

    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 1, (478, 2)).astype(np.float32)
    dbg = {"bad_format": 0, "too_few_points": 0, "bad_scale": 0}
    want = _frame_to_features(xy, rot_invariant=False, dbg=dbg)
    got = lmk_frame_to_features(xy, rot_invariant=False)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    want_r = _frame_to_features(xy, rot_invariant=True, dbg=dbg)
    got_r = lmk_frame_to_features(xy, rot_invariant=True)
    np.testing.assert_allclose(got_r, want_r, rtol=1e-5, atol=1e-6)
    assert got.shape == (LMK_FEATURE_DIM,)


def test_au_features_match_reference():
    from tests.oracles.ref_i3d import use_reference_root

    use_reference_root(REF)
    from data.make_au_features import seq_au_to_features

    rng = np.random.RandomState(1)
    seq = [{k: float(rng.rand()) for k in AU_ORDER} for _ in range(10)]
    want = seq_au_to_features(seq, AU_ORDER, use_delta=True, use_delta2=True)
    got = au_seq_to_features(seq, AU_ORDER)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.shape == (10, 36)


def test_tech_inference_matches_reference():
    from tests.oracles.ref_i3d import use_reference_root

    use_reference_root(REF)
    from data.dataset_dual import _infer_tech_from_path

    paths = [
        "/d/FaceForensics++_C23/original/v1/track_0/clip_3",
        "/d/FF/Deepfakes/v7/track_1/clip_0",
        "/d/celebdf_v2/Celeb-synthesis/v3/track_0/clip_1",
        "/d/x/NeuralTextures/v2/track_0/clip_0",
        "/d/weird/unknowntech/v/track_0/clip_0",
    ]
    for p in paths:
        assert infer_tech_from_path(p) == _infer_tech_from_path(p), p


def _build_tree(root, n_videos=4, n_clips=3, T=10):
    rng = np.random.RandomState(0)
    dirs = []
    for tech, lab in [("original", 0), ("deepfakes", 1)]:
        for v in range(n_videos):
            for t in range(1):
                for c in range(n_clips):
                    d = os.path.join(root, "FF", tech, f"video{v}", "track_0", f"clip_{c}")
                    os.makedirs(d, exist_ok=True)
                    np.save(os.path.join(d, "au_features.npy"),
                            rng.randn(T, 36).astype(np.float32))
                    np.save(os.path.join(d, "lmk_features.npy"),
                            rng.randn(T, 132).astype(np.float32))
                    dirs.append(d)
    return dirs


def test_dataset_loading_and_ids(tmp_path):
    _build_tree(str(tmp_path))
    ds = DualFeaturesClipDataset(root_dir=str(tmp_path), T=8, is_train=False)
    assert len(ds) == 24
    item = ds[0]
    assert item["A"].shape == (8, 36) and item["L"].shape == (8, 132)
    assert item["lengths"] == 8
    assert set(ds.labels) == {0, 1}
    assert ds.n_domains == 2  # real + deepfakes
    # clips of one track share the same trk id; one video same vid id
    assert len(set(ds.trk_ids)) == 8 and len(set(ds.vid_ids)) == 8
    all_data = ds.load_all()
    assert all_data["A"].shape == (24, 8, 36)
    # per-clip zscore: mean ~0 per channel
    assert abs(all_data["A"].mean()) < 0.1


def test_dataset_stitching(tmp_path):
    _build_tree(str(tmp_path), n_clips=4)
    ds = DualFeaturesClipDataset(root_dir=str(tmp_path), T=16, stitch_k=2)
    # 4 clips per track → 3 windows per track × 8 tracks
    assert len(ds) == 24
    item = ds[0]
    assert item["A"].shape == (16, 36)
    assert item["lengths"] == 16  # 2×10 frames cropped to 16


def test_dataset_eject_broken(tmp_path):
    dirs = _build_tree(str(tmp_path))
    bad = os.path.join(dirs[0], "lmk_features.npy")
    with open(bad, "wb") as f:
        f.write(b"not-an-npy")
    ds = DualFeaturesClipDataset(root_dir=str(tmp_path), eject_broken=True)
    assert len(ds) == 23


def test_process_clip_tree_and_norm_stats(tmp_path):
    rng = np.random.RandomState(0)
    d = tmp_path / "FF" / "original" / "v0" / "track_0" / "clip_0"
    os.makedirs(d)
    lmks = rng.uniform(0.1, 0.9, (6, 478, 2)).astype(np.float32)
    np.save(d / "landmarks.npy", lmks)
    aus = np.array([{k: float(rng.rand()) for k in AU_ORDER} for _ in range(6)], dtype=object)
    np.save(d / "aus.npy", aus, allow_pickle=True)
    stats = process_clip_tree(str(tmp_path))
    assert stats["lmk_ok"] == 1 and stats["au_ok"] == 1
    F = np.load(d / "lmk_features.npy")
    assert F.shape == (6, 132)
    A = np.load(d / "au_features.npy")
    assert A.shape == (6, 36)
    out = compute_norm_stats(str(tmp_path), str(tmp_path / "norm.npz"))
    S = np.load(out)
    assert S["au_mean"].shape == (36,) and S["lmk_std"].shape == (132,)


def test_split_no_leakage(tmp_path):
    dirs = _build_tree(str(tmp_path), n_videos=10)
    split = make_split(dirs, ratios=(0.6, 0.2, 0.2), seed=1)
    assert check_no_leakage(split)
    total = sum(len(v) for v in split.values())
    assert total == len(dirs)
    # both classes in train
    labs = {label_from_dir(d) for d in split["train"]}
    assert labs == {0, 1}
    # determinism
    split2 = make_split(dirs, ratios=(0.6, 0.2, 0.2), seed=1)
    assert split == split2


def test_split_links_manipulated_identities(tmp_path):
    """FF++-style identity linking: a fake named <src>_<tgt> must share a
    phase with BOTH originals it was generated from — otherwise the test
    phase sees actors the model trained on and metrics inflate. (The
    reference's split tooling shuffles bare dir lists and HAS this leak.)"""
    import os

    dirs = []
    for tech, vids in [
        ("original", [f"{i:03d}" for i in range(8)]),
        ("deepfakes", ["000_003", "001_002", "004_005", "006_007"]),
        ("face2face", ["003_000", "002_001"]),
    ]:
        for v in vids:
            d = os.path.join(str(tmp_path), tech, v, "track_0", "clip_00000")
            os.makedirs(d, exist_ok=True)
            dirs.append(d)
    for seed in range(4):
        split = make_split(dirs, ratios=(0.5, 0.25, 0.25), seed=seed)
        assert check_no_leakage(split), seed
        phase_of = {d: p for p in split for d in split[p]}
        # original/000, original/003, deepfakes/000_003, face2face/003_000
        # all share identities -> one phase
        linked = [d for d in dirs if any(
            t in d for t in ("/000/", "/003/", "000_003", "003_000"))]
        assert len({phase_of[d] for d in linked}) == 1, (seed, linked)
    # the old per-video grouping would have flagged this layout as leaky
    # under the identity check at SOME seed; sanity: video-level check alone
    # also passes (it is strictly weaker)
    assert check_no_leakage(split, identities=False)


def test_degrader_shapes():
    pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(8)]
    deg = ClipDegrader(seed=3)
    out = deg(frames)
    assert 1 <= len(out) <= 8
    assert all(f.shape == (64, 64, 3) for f in out)
    # degraded differs from input
    assert any(np.abs(a.astype(int) - b.astype(int)).mean() > 1 for a, b in zip(out, frames))


def test_regen_dataset(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)

    for tech in ("original", "deepfakes"):
        d = tmp_path / tech
        os.makedirs(d, exist_ok=True)
        vw = cv2.VideoWriter(str(d / "v.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (160, 120))
        for _ in range(30):
            vw.write(rng.randint(0, 255, (120, 160, 3), np.uint8))
        vw.release()

    def fake_landmarker(frame_rgb):
        r = np.random.RandomState(int(frame_rgb[0, 0, 0]))
        return r.uniform(0.2, 0.8, (478, 2)).astype(np.float32) * 100

    from stdd_tpu.data.regen import DualVideoRegenDataset

    ds = DualVideoRegenDataset(
        [str(tmp_path / "original" / "v.mp4"), str(tmp_path / "deepfakes" / "v.mp4")],
        landmarker=fake_landmarker, T=8, is_train=True, seed=1,
    )
    assert len(ds) == 2 and ds.labels == [0, 1]
    item = ds[0]
    assert item["L"].shape == (8, 132) and item["A"].shape == (8, 36)
    assert item["lengths"] >= 1
    assert item["A"].sum() == 0  # zero AUs without an extractor (reference :239)
    batch = ds.load_all()
    assert batch['A'].shape == (2, 8, 36)
