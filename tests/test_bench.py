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
