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
        # latency budget decomposition (stage stamps are always recorded)
        for k in ("lat_queue_p50_ms", "lat_dispatch_p50_ms",
                  "lat_device_p50_ms", "lat_fetch_p50_ms"):
            assert xm[k] >= 0.0
        # self-certification: the timed windows program and the parity-
        # tested packed program agree on one identical clip (f32 CPU config
        # here; the on-chip bf16 run stays well under 1e-2)
        assert xm["window_vs_packed_score_delta"] <= 5e-3
        # pool-speed calibration: ship→score floor of one B=1 window
        assert xm["window_device_rtt_ms"] > 0
        assert xm["multi_face_fps_4"] > 0
        assert xm["multi_face_window_p50_ms"] > 0
        # paced-arrival latency at the production 30 fps frame rate — the
        # free-run fields above measure latency under maximum overload
        assert xm["paced30_window_p50_ms"] > 0
        assert xm["multi_face_paced30_window_p50_ms"] > 0
        assert xm["paced30_frames_late"] >= 0


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

def test_bench_scene_expr_order_scrambles_time_not_space():
    """The synthetic-deepfake knob (scripts/run_synth_e2e.py): a permuted
    expr_order must scramble WHICH expression frame shows (temporal
    incoherence) while keeping sprite geometry identical — same paste
    positions, same sprite set — so detection/tracking cannot shortcut."""
    import numpy as np
    import pytest

    from stdd_tpu.eval.bench_scene import BenchScene

    mk = lambda **kw: BenchScene((216, 384), n_faces=1, seed=5, face_px=64,
                                 loop=8, **kw)
    real = mk()
    ident = mk(expr_order=np.arange(8))
    perm = np.array([3, 0, 6, 1, 7, 2, 5, 4])
    fake = mk(expr_order=perm)

    diff = 0
    for i in range(8):
        a = real.frame(i, copy=True)
        np.testing.assert_array_equal(a, ident.frame(i, copy=True))
        b = fake.frame(i, copy=True)
        # the fake's frame i must equal the REAL's frame at the permuted
        # loop slot modulo position drift — cheap proxy: same sprite pixels
        # pasted at the same position as real.frame(j) would use at i's pos
        np.testing.assert_array_equal(fake.sprites, real.sprites)
        diff += int(not np.array_equal(a, b))
    assert diff >= 6          # scrambled frames differ on most loop slots
    np.testing.assert_array_equal(real._positions(13), fake._positions(13))

    with pytest.raises(ValueError):
        mk(expr_order=np.array([0, 1, 2, 3, 4, 5, 6, 6]))
    with pytest.raises(ValueError):
        mk(expr_order=np.arange(7))


def test_bench_tpu_child_line_passthrough(monkeypatch, capsys, tmp_path):
    """When the probe is green, the on-TPU bench runs in a bounded child
    subprocess (a green probe does not guarantee big compiles return —
    round-3 rig log), the parent passes its JSON line through verbatim and
    records the on-chip run as the last-on-chip artifact (VERDICT r4 #1c)."""
    import subprocess

    import bench

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("STDD_BENCH_TPU_BUDGET_S", raising=False)
    monkeypatch.setenv("STDD_BENCH_NO_PROBE", "0")
    monkeypatch.setattr(bench, "_ladder_probe", lambda: (False, None))

    canned = {"metric": "streaming_fps_1080p", "value": 107.8,
              "unit": "frames/s", "vs_baseline": 7.2}
    seen = {}

    class FakeProc:
        pid = 12345
        returncode = 0

        def __init__(self, cmd, env=None, start_new_session=None, **kw):
            seen["env"] = env
            seen["start_new_session"] = start_new_session

        def communicate(self, timeout=None):
            seen["timeout"] = timeout
            return ("noise\n" + __import__("json").dumps(canned) + "\n",
                    "child stderr tail")

    monkeypatch.setattr(bench.subprocess, "Popen", FakeProc)
    # the on-chip record must land in the sandboxed path, not the repo's
    onchip = tmp_path / "BENCH_ONCHIP.json"
    monkeypatch.setattr(bench, "_ONCHIP_PATH", str(onchip))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert __import__("json").loads(line) == canned
    assert seen["env"]["STDD_BENCH_TPU_CHILD"] == "1"
    assert seen["env"]["STDD_BENCH_NO_PROBE"] == "1"
    assert float(seen["env"]["STDD_BENCH_DEADLINE"]) > 0
    assert seen["start_new_session"] is True
    assert seen["timeout"] == 1500.0
    rec = __import__("json").loads(onchip.read_text())
    assert rec["value"] == 107.8 and rec["recorded_utc"]


def test_bench_tpu_child_timeout_falls_back_to_cpu(monkeypatch, capsys):
    """A hung TPU warmup is killed (whole process group — the child may have
    spawned a pipe-inheriting grandchild) at STDD_BENCH_TPU_BUDGET_S and the
    parent still emits the one judged line from the CPU path."""
    import subprocess

    import bench

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("STDD_BENCH_FALLBACK_REASON", raising=False)
    monkeypatch.setenv("STDD_BENCH_TPU_BUDGET_S", "7")
    monkeypatch.setattr(bench, "_ladder_probe", lambda: (False, None))

    killed = {}

    class HungProc:
        pid = 12345
        returncode = None

        def __init__(self, cmd, **kw):
            self._cmd = cmd

        def communicate(self, timeout=None):
            if not killed:
                raise subprocess.TimeoutExpired(self._cmd, timeout,
                                                stderr="hung in warmup")
            return "", "post-kill stderr"

        def kill(self):
            killed["plain"] = True

    monkeypatch.setattr(bench.subprocess, "Popen", HungProc)
    monkeypatch.setattr(bench.os, "killpg",
                        lambda pid, sig: killed.setdefault("pg", (pid, sig)))
    cpu_line = {"metric": "streaming_fps_cpu_fallback", "value": 13.7,
                "unit": "frames/s", "vs_baseline": 0.9}
    monkeypatch.setattr(bench, "bench_engine", lambda: dict(cpu_line))
    bench.main()
    out = capsys.readouterr()
    got = __import__("json").loads(out.out.strip().splitlines()[-1])
    assert {k: got[k] for k in cpu_line} == cpu_line
    assert killed["pg"] == (12345, bench.signal.SIGKILL)
    # the fallback line must carry the machine-readable cause (VERDICT r4
    # #1b): the decisive event here is the child's kill at the budget
    assert got["extra_metrics"]["fallback_reason"] == "tpu_child_timeout_7s"


def test_bench_last_json_line_tolerates_noise():
    import bench

    assert bench._last_json_line("junk\n{bad json}\n{\"a\": 1}\ntail") == {"a": 1}
    assert bench._last_json_line("no json at all") is None


def test_fallback_context_carries_last_onchip(monkeypatch, tmp_path):
    """A CPU-fallback line embeds a compact summary of the committed
    last-on-chip artifact so the judged chain carries hardware evidence
    even on a down-chip day (VERDICT r4 #1c)."""
    import json as _json

    import bench

    onchip = tmp_path / "BENCH_ONCHIP.json"
    monkeypatch.setattr(bench, "_ONCHIP_PATH", str(onchip))
    bench._record_onchip({
        "metric": "streaming_fps_1080p", "value": 61.5,
        "extra_metrics": {"window_latency_p50_ms": 41.5,
                          "multi_face_fps_4": 52.43,
                          "window_vs_packed_score_delta": 1.3e-6}})
    line = {"metric": "streaming_fps_cpu_fallback", "value": 11.0}
    bench._attach_fallback_context(line, "probe_ladder_exhausted:timeout120s")
    em = line["extra_metrics"]
    assert em["fallback_reason"].startswith("probe_ladder_exhausted")
    assert em["last_onchip"]["streaming_fps_1080p"] == 61.5
    assert em["last_onchip"]["window_latency_p50_ms"] == 41.5
    assert em["last_onchip"]["multi_face_fps_4"] == 52.43
    assert em["last_onchip"]["recorded_utc"]
    # an ON-CHIP line is never decorated
    good = {"metric": "streaming_fps_1080p", "value": 60.0}
    bench._attach_fallback_context(good, "whatever")
    assert "extra_metrics" not in good
