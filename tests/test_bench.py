"""bench.py smoke: the judged benchmark entry must emit ONE valid JSON line
with the metric contract (fps + latency extra metrics) even on CPU — this is
also the driver's last-resort path when the TPU backend is down."""

import io
import json
import sys


def test_bench_main_emits_contract_json(capsys):
    import bench

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(out)
    assert out["value"] > 0
    if out["metric"].startswith("streaming_fps"):
        xm = out["extra_metrics"]
        assert xm["clips_per_s"] > 0
        assert xm["window_latency_p50_ms"] > 0


def test_bench_scene_frame_deterministic_under_canvas_reuse():
    """BenchScene.frame(i) recycles canvases (restoring only the exposed
    sliver of each stale sprite rect) — content must stay a pure function of
    ``i`` through arbitrary revisit orders, including the sequential-drift
    pattern the bench actually runs (overlapping old/new rects)."""
    import numpy as np

    from stdd_tpu.eval.bench_scene import BenchScene

    mk = lambda: BenchScene((216, 384), n_faces=2, seed=2, face_px=64)
    ref_scene = mk()
    ref = {i: ref_scene.frame(i, copy=True) for i in range(40)}

    seq_scene = mk()   # sequential: small drifts → sliver restores
    for i in range(40):
        np.testing.assert_array_equal(seq_scene.frame(i), ref[i])

    rnd_scene = mk()   # random revisits: large jumps → full-rect restores
    rng = np.random.RandomState(0)
    for i in rng.randint(0, 40, 96):
        np.testing.assert_array_equal(rnd_scene.frame(int(i)), ref[int(i)])

    # a returned frame stays valid for the next _N_CANVAS - 1 calls
    s = mk()
    held = s.frame(5)
    snapshot = held.copy()
    for i in range(6, 6 + s._N_CANVAS - 1):
        s.frame(i)
    np.testing.assert_array_equal(held, snapshot)
