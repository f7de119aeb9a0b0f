#!/bin/bash
# Round-4 batch D: validate the paced-arrival fields now built into the
# judged bench (bench.py emits paced30_* + window_device_rtt_ms) with one
# full on-chip run, then refresh the multi-face operating-point table with
# a 9-face paced point (the 9-face row in docs/PERF.md predates the
# lane-side routing fix).
# NOTE: one host core — run nothing else (pytest included) while measuring.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4d}
mkdir -p "$OUT"

probe() {
  python - <<'EOF'
import sys
sys.path.insert(0, ".")
from bench import tpu_available
sys.exit(0 if tpu_available(150) else 3)
EOF
}

n=0
until probe; do
  n=$((n + 1))
  echo "$(date -u +%FT%TZ) probe $n: TPU down; retry in 300s" >> "$OUT/watch.log"
  sleep 300
done
echo "$(date -u +%FT%TZ) TPU up after $n retries — measuring" >> "$OUT/watch.log"

echo "== 1. judged bench (with paced30 fields) ==" >> "$OUT/watch.log"
timeout 2100 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err"
echo "$(date -u +%FT%TZ) bench rc=$?" >> "$OUT/watch.log"

echo "== 2. paced latency, 9 faces ==" >> "$OUT/watch.log"
timeout 1500 python scripts/measure_paced_latency.py --faces 9 \
  > "$OUT/paced9.json" 2> "$OUT/paced9.err"
echo "$(date -u +%FT%TZ) paced9 rc=$?" >> "$OUT/watch.log"

echo "== 3. synth end-to-end capstone (preprocess -> train -> serve) ==" >> "$OUT/watch.log"
timeout 3500 python scripts/run_synth_e2e.py --fresh --out /tmp/synth_full \
  > "$OUT/synth.json" 2> "$OUT/synth.err"
echo "$(date -u +%FT%TZ) synth rc=$?" >> "$OUT/watch.log"

touch "$OUT/DONE"
echo "$(date -u +%FT%TZ) done — paste results into docs/PERF.md" >> "$OUT/watch.log"
