"""Import the REFERENCE TEST2 scoring/aggregation as a numerical oracle.

Round-2 VERDICT #4: ``_pool_track`` / ``score_with_stability`` / the QA
override used to be golden-tested against an inline re-derivation, which
could share a misreading with the implementation. This module loads the
reference's ACTUAL code:

- ``_pool_track`` and ``score_with_stability`` are nested functions inside
  ``VideoRunner.run`` (TEST2.py:627,:636) — they close over nothing, so we
  materialize callables directly from their code objects
  (``run.__code__.co_consts``), the same bytecode the reference executes.
- The end-of-video aggregation (POOL/stability/QA-override/OR-verdict,
  TEST2.py:699-766) is inline statements, not a function — we exec the
  exact source segment sliced out of TEST2.py at test time against a fake
  ``self.args``/``track_clip_scores`` namespace. No reference source is
  copied into the repo; it is read from /root/reference on each run.

Import-time stubs (TEST2.py:13-39 pulls heavy deps): mediapipe (only
instantiated inside FaceMeshSvc, a bare module suffices), lap + cython_bbox
(ByteTrack's C deps — same stubs as tests/test_tracking.py), fvcore/timm via
ref_i3d (plugin_loader → model._base chain).
"""

from __future__ import annotations

import os
import sys
import textwrap
import types

import numpy as np

from .ref_i3d import REFERENCE_ROOT, _install_fvcore_stub, use_reference_root


def _install_light_stubs():
    if "mediapipe" not in sys.modules:
        mp = types.ModuleType("mediapipe")
        mp.solutions = types.SimpleNamespace(
            face_mesh=types.SimpleNamespace(FaceMesh=None))
        sys.modules["mediapipe"] = mp
    if "lap" not in sys.modules:
        from stdd_tpu.track.matching import linear_assignment

        lap_mod = types.ModuleType("lap")

        def lapjv(cost, extend_cost=True, cost_limit=np.inf):
            matches, _, _ = linear_assignment(np.asarray(cost), cost_limit)
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
        from stdd_tpu.track.matching import bbox_ious_plus1

        cb = types.ModuleType("cython_bbox")
        cb.bbox_overlaps = lambda a, b: bbox_ious_plus1(a, b)
        sys.modules["cython_bbox"] = cb


def load_test2_module():
    """Import the reference TEST2 module with its heavy deps stubbed."""
    _install_fvcore_stub()
    _install_light_stubs()
    use_reference_root(REFERENCE_ROOT)
    root = os.path.dirname(REFERENCE_ROOT)
    if root not in sys.path:
        sys.path.insert(1, root)
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)   # its config resolves YAMLs relative to cwd
    try:
        import TEST2
    finally:
        os.chdir(cwd)
    return TEST2


def reference_pool_fns():
    """→ (_pool_track, score_with_stability): the reference's OWN nested
    functions, materialized from VideoRunner.run's code objects. Call with
    every argument explicit (defaults live in the enclosing frame, not the
    code object)."""
    TEST2 = load_test2_module()
    run_code = TEST2.VideoRunner.run.__code__
    found = {}
    for const in run_code.co_consts:
        if isinstance(const, types.CodeType) and const.co_name in (
                "_pool_track", "score_with_stability"):
            found[const.co_name] = types.FunctionType(
                const, TEST2.__dict__, const.co_name)
    assert set(found) == {"_pool_track", "score_with_stability"}, found
    return found["_pool_track"], found["score_with_stability"]


def reference_aggregate(track_clip_scores, args, low_quality: bool):
    """Run the reference's END-OF-VIDEO aggregation source (TEST2.py
    POOL_METH= … video_score=…) sliced straight out of the file, with the
    reference's own nested pool/stability functions in scope.

    ``args`` is a namespace carrying the reference arg names
    (pool_method, topk_ratio, percentile_p, trim_ratio, min_clips,
    optimal_threshold, disable_penalty, qa_q75_thr, qa_q90_thr).
    → dict(raw_scores, per_person, per_person_labels, video_fake,
    video_score)."""
    pool, stab = reference_pool_fns()
    src = open(os.path.join(REFERENCE_ROOT, "TEST2.py")).read()
    a = src.index("POOL_METH = getattr")
    b = src.index("video_score = float(")
    b = src.index("\n", b)
    seg = textwrap.dedent(" " * 8 + src[a:b])   # method body is indented 8
    ns = {
        "np": np,
        "self": types.SimpleNamespace(args=args),
        "track_clip_scores": track_clip_scores,
        "low_quality": bool(low_quality),
        "_pool_track": pool,
        "score_with_stability": stab,
    }
    exec(compile(seg, "TEST2.py[aggregation-slice]", "exec"), ns)
    return {
        "raw_scores": ns["raw_scores"],
        "per_person": ns["per_person"],
        "per_person_labels": ns["per_person_labels"],
        "video_fake": ns["video_fake"],
        "video_score": ns["video_score"],
    }
