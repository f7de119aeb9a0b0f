"""Tracking-stack parity tests against the reference ByteTrack
(the reference's lap/cython_bbox C deps are stubbed with our own host
implementations, which are themselves tested here)."""

import sys
import types

import numpy as np
import pytest

from stdd_tpu.track import kalman
from stdd_tpu.track.byte_tracker import ByteTracker, TrackState
from stdd_tpu.track.matching import bbox_ious_plus1, fuse_score, iou_cost, linear_assignment

REF = "/root/reference"


def _load_ref_tracker():
    """Import the reference BYTETracker with lap/cython_bbox stubs."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    if "lap" not in sys.modules:
        lap_mod = types.ModuleType("lap")

        def lapjv(cost, extend_cost=True, cost_limit=np.inf):
            matches, u_rows, u_cols = linear_assignment(np.asarray(cost), cost_limit)
            n, m = np.asarray(cost).shape
            x = np.full(n, -1, dtype=int)
            y = np.full(m, -1, dtype=int)
            total = 0.0
            for r, c in matches:
                x[r], y[c] = c, r
                total += cost[r][c]
            return total, x, y

        lap_mod.lapjv = lapjv
        sys.modules["lap"] = lap_mod

    if "cython_bbox" not in sys.modules:
        cb = types.ModuleType("cython_bbox")
        cb.bbox_overlaps = lambda a, b: bbox_ious_plus1(a, b)
        sys.modules["cython_bbox"] = cb

    from preprocessing.ByteTrack.byte_tracker import BYTETracker
    from preprocessing.ByteTrack.basetrack import BaseTrack

    BaseTrack._count = 0  # reference's class-global id counter
    return BYTETracker


def test_kalman_matches_reference():
    sys.path.insert(0, REF)
    from preprocessing.ByteTrack.kalman_filter import KalmanFilter

    ref = KalmanFilter()
    rng = np.random.RandomState(0)
    meas = np.array([100.0, 80.0, 0.7, 50.0])
    m_ref, c_ref = ref.initiate(meas)
    m, c = kalman.initiate(meas)
    np.testing.assert_allclose(m, m_ref, rtol=1e-12)
    np.testing.assert_allclose(c, c_ref, rtol=1e-12)

    for step in range(5):
        m_ref, c_ref = ref.predict(m_ref, c_ref)
        ms, cs = kalman.predict(m[None], c[None])
        m, c = ms[0], cs[0]
        np.testing.assert_allclose(m, m_ref, rtol=1e-10)
        np.testing.assert_allclose(c, c_ref, rtol=1e-10)

        z = meas + rng.randn(4) * [2, 2, 0.01, 1.5]
        m_ref, c_ref = ref.update(m_ref, c_ref, z)
        ms, cs = kalman.update(m[None], c[None], z[None])
        m, c = ms[0], cs[0]
        np.testing.assert_allclose(m, m_ref, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(c, c_ref, rtol=1e-8, atol=1e-10)

    g_ref = ref.gating_distance(m_ref, c_ref, meas[None] + 1.0)
    g = kalman.gating_distance(m, c, meas[None] + 1.0)
    np.testing.assert_allclose(g, g_ref, rtol=1e-8)


def test_linear_assignment_thresholding():
    cost = np.array([[0.1, 0.9], [0.8, 0.2]])
    matches, ur, uc = linear_assignment(cost, 0.5)
    assert sorted(map(tuple, matches)) == [(0, 0), (1, 1)]
    # raise below both: everything unmatched
    matches, ur, uc = linear_assignment(cost, 0.05)
    assert len(matches) == 0 and list(ur) == [0, 1] and list(uc) == [0, 1]
    # rectangular
    matches, ur, uc = linear_assignment(np.array([[0.1, 0.9, 0.3]]), 0.5)
    assert list(map(tuple, matches)) == [(0, 0)] and list(uc) == [1, 2]


def _simulate_dets(rng, n_frames=60):
    """3 crossing faces with jitter, score dips and dropouts."""
    seq = []
    for f in range(n_frames):
        dets = []
        for k, (x0, y0, vx, vy) in enumerate(
            [(50, 60, 2.0, 0.4), (260, 70, -2.2, 0.3), (150, 200, 0.1, -1.0)]
        ):
            if k == 1 and 25 <= f < 31:  # dropout
                continue
            x = x0 + vx * f + rng.randn() * 1.5
            y = y0 + vy * f + rng.randn() * 1.5
            w = 60 + rng.randn() * 2
            h = 75 + rng.randn() * 2
            score = 0.85 + rng.randn() * 0.05
            if k == 2 and 40 <= f < 44:  # score dip → stage-2 association
                score = 0.35
            dets.append([x, y, x + w, y + h, np.clip(score, 0.11, 0.99)])
        seq.append(np.asarray(dets, dtype=float))
    return seq


def test_tracker_parity_with_reference():
    """Oracle comparison in the reference's PRODUCTION configuration: its call
    sites (af_realtime.py:388 etc.) pass pre-built STrack lists in tlwh, which
    bypasses the two-stage score split inside BYTETracker.update."""
    BYTETracker = _load_ref_tracker()
    from preprocessing.ByteTrack.byte_tracker import STrack

    class Args:
        track_thresh = 0.6
        match_thresh = 0.6
        track_buffer = 30
        mot20 = False

    ref = BYTETracker(Args(), frame_rate=30)
    mine = ByteTracker(
        track_thresh=0.6, match_thresh=0.6, track_buffer=30, split_low_scores=False
    )

    rng = np.random.RandomState(0)
    seq = _simulate_dets(rng)
    id_map = {}
    for f, dets in enumerate(seq):
        ref_in = [
            STrack(np.array([d[0], d[1], d[2] - d[0], d[3] - d[1]]), float(d[4]))
            for d in dets
        ]
        ref_out = ref.update(ref_in, (1000, 1000), (1000, 1000))
        my_out = mine.update(dets.copy())
        assert len(ref_out) == len(my_out), f"frame {f}: {len(ref_out)} vs {len(my_out)}"
        ref_sorted = sorted(ref_out, key=lambda t: t.tlbr[0])
        my_sorted = sorted(my_out, key=lambda t: t.tlbr[0])
        for rt, mt in zip(ref_sorted, my_sorted):
            np.testing.assert_allclose(mt.tlbr, rt.tlbr, rtol=1e-6, atol=1e-6)
            # identity consistency: the ref→mine id mapping must never change
            if rt.track_id in id_map:
                assert id_map[rt.track_id] == mt.track_id, f"id switch at frame {f}"
            else:
                id_map[rt.track_id] = mt.track_id


def test_tracker_empty_frames_and_expiry():
    mine = ByteTracker(track_thresh=0.6, match_thresh=0.6, track_buffer=3)
    d = np.array([[10, 10, 60, 70, 0.9]])
    out = mine.update(d)
    assert len(out) == 1  # frame 1 activates instantly
    tid = out[0].track_id
    for _ in range(2):
        out = mine.update(d + [1, 1, 1, 1, 0])
    assert out[0].track_id == tid
    # now starve it past the buffer
    for _ in range(5):
        out = mine.update(np.empty((0, 5)))
        assert out == []
    assert mine.lost == []  # expired
    # .removed holds only the LAST frame's removals (bounded memory on a
    # long-running stream); the cumulative record is the id set
    assert tid in mine._removed_ids


def test_two_stage_recovers_low_score_dips():
    """Proper ByteTrack (split ON) keeps a track through a confidence dip via
    the second association stage; the reference-equivalent mode loses it."""
    def run(split):
        tr = ByteTracker(track_thresh=0.6, match_thresh=0.6, track_buffer=50,
                         split_low_scores=split)
        ids = []
        for f in range(20):
            s = 0.3 if 8 <= f < 12 else 0.9
            x = 10 + 2 * f
            out = tr.update(np.array([[x, 10, x + 60, 85, s]]))
            ids.append(out[0].track_id if out else None)
        return ids

    ids_split = run(True)
    assert ids_split[-1] == ids_split[0] and None not in ids_split[1:]
    ids_ref = run(False)
    # reference-equivalent mode: during the dip the det is fuse-score-rejected
    assert None in ids_ref[8:12]
