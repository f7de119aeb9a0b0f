"""I3DClipDataset window stitching vs the preprocess writer's overlap.

The writer emits sliding clips (CLIP_LENGTH=8, CLIP_STEP=4 — mirroring the
reference's preprocessing_parallel.py:97/:416), so consecutive clip dirs
share 4 frames. Stitching must produce unique, time-ordered frames — both
via exact frame_ids.npy dedupe and via the step-convention fallback for
trees written before frame_ids existed."""

import os

import numpy as np
import pytest

from stdd_tpu.data.dataset_i3d import I3DClipDataset

LENGTH, STEP = 8, 4


def _write_tree(root, n_clips=8, with_fids=True, label="fake", gap_at=None):
    """Overlapping clips whose every frame encodes its source frame id in
    pixel [0,0,0]; ``gap_at`` drops that clip index (gated clip) while the
    later fids keep their true source positions."""
    base = os.path.join(root, label, "vid1", "track_0")
    fid0 = 0
    written = []
    for ci in range(n_clips):
        start = fid0 + ci * STEP
        if gap_at is not None and ci == gap_at:
            continue
        fids = np.arange(start, start + LENGTH)
        frames = np.zeros((LENGTH, 16, 16, 3), np.uint8)
        frames[:, 0, 0, 0] = fids % 256
        d = os.path.join(base, f"clip_{ci:05d}")
        os.makedirs(d)
        np.save(os.path.join(d, "images.npy"), frames)
        if with_fids:
            np.save(os.path.join(d, "frame_ids.npy"), fids)
        written.append(d)
    return written


@pytest.mark.parametrize("with_fids", [True, False])
def test_stitched_window_has_unique_monotonic_frames(tmp_path, with_fids):
    _write_tree(str(tmp_path), n_clips=8, with_fids=with_fids)
    ds = I3DClipDataset(root_dir=str(tmp_path), T=16, is_train=False)
    # k clips cover LENGTH + (k-1)*STEP unique frames; T=16 needs k=3
    assert all(len(w) == 3 for w in ds.windows)
    item = ds[0]
    clip = item["clip"]
    assert clip.shape[0] == 16
    fids = clip[:, 0, 0, 0].astype(int)
    assert (np.diff(fids) == 1).all(), f"not contiguous: {fids.tolist()}"
    assert len(set(fids.tolist())) == 16, "duplicated frames in the window"


def test_stitch_fallback_matches_fid_dedupe(tmp_path):
    """On a gap-free tree the step-convention fallback and the exact fid
    dedupe must produce identical windows."""
    _write_tree(str(tmp_path), n_clips=6, with_fids=True)
    ds = I3DClipDataset(root_dir=str(tmp_path), T=16, is_train=False)
    exact = ds._stitch(ds.windows[0])
    for d in ds.windows[0]:
        os.remove(os.path.join(d, "frame_ids.npy"))
    fallback = ds._stitch(ds.windows[0])
    np.testing.assert_array_equal(exact, fallback)


def test_stitch_dedupes_across_gapped_clips(tmp_path):
    """A gated-out clip leaves a frame-id gap; the exact path must still
    produce unique monotonic ids (no duplicates, no backward jumps)."""
    _write_tree(str(tmp_path), n_clips=8, with_fids=True, gap_at=2)
    ds = I3DClipDataset(root_dir=str(tmp_path), T=16, is_train=False)
    fids = ds._stitch(ds.windows[0])[:, 0, 0, 0].astype(int)
    assert (np.diff(fids) > 0).all(), fids.tolist()


def test_short_track_pads_with_last_frame(tmp_path):
    _write_tree(str(tmp_path), n_clips=1, with_fids=True)
    ds = I3DClipDataset(root_dir=str(tmp_path), T=16, is_train=False)
    clip = ds[0]["clip"]
    assert clip.shape[0] == 16
    fids = clip[:, 0, 0, 0].astype(int)
    assert fids[LENGTH:].tolist() == [fids[LENGTH - 1]] * (16 - LENGTH)
