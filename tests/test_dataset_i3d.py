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


def test_geo_jitter_is_clip_consistent(tmp_path):
    """Geometric jitter applies ONE similarity to every frame of a clip
    (temporal consistency is load-bearing) and is off at geo_jitter=0."""
    import numpy as np

    from stdd_tpu.data.dataset_i3d import I3DClipDataset

    d = tmp_path / "x" / "track_1" / "clip_00000"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    # static clip: after a shared warp all frames must stay identical
    frame = rng.randint(0, 255, (64, 64, 3), np.uint8)
    np.save(d / "images.npy", np.repeat(frame[None], 8, axis=0))

    ds = I3DClipDataset(clip_dirs=[str(d)], T=8, is_train=True, seed=1,
                        geo_jitter=1.0, color_jitter=0, p_gauss_blur=0,
                        p_gauss_noise=0, p_jpeg=0, p_erase=0)
    # draw until the 0.8-probability geo branch fires and changes pixels
    for _ in range(8):
        clip = ds[0]["clip"]
        if not np.array_equal(clip, np.repeat(frame[None], 8, axis=0)):
            break
    assert clip.shape == (8, 64, 64, 3) and clip.dtype == np.uint8
    for t in range(1, 8):
        np.testing.assert_array_equal(clip[t], clip[0])

    ds0 = I3DClipDataset(clip_dirs=[str(d)], T=8, is_train=True, seed=1,
                         geo_jitter=0.0, color_jitter=0, p_gauss_blur=0,
                         p_gauss_noise=0, p_jpeg=0, p_erase=0)
    np.testing.assert_array_equal(ds0[0]["clip"],
                                  np.repeat(frame[None], 8, axis=0))
