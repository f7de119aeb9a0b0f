#!/bin/bash
# One-shot runner for the round-3 measurements that are pending on TPU
# recovery (the axon backend was down from late round 2 through round 3).
# Safe to run blind: every step is timeout-bounded and the probe never
# touches the backend in-process.
set -u
cd "$(dirname "$0")/.."

echo "== probe =="
python - <<'EOF'
import sys
sys.path.insert(0, ".")
from bench import tpu_available
ok = tpu_available(120)
print("TPU available:", ok)
sys.exit(0 if ok else 3)
EOF
if [ $? -ne 0 ]; then echo "TPU still down — nothing to measure"; exit 3; fi

echo "== 1. flagship forward (__graft_entry__) =="
timeout 590 python __graft_entry__.py

echo "== 2. judged bench (ring path, real detections, multi-face extras) =="
timeout 590 python bench.py | tee /tmp/bench_r3.json

echo "== 3. int8 s3-s5 A/B =="
timeout 590 python scripts/measure_int8.py | tee /tmp/int8_r3.json

echo "== done — paste results into docs/PERF.md =="
