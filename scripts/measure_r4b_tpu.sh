#!/bin/bash
# Round-4 follow-up TPU batch (the chip flapped mid-round). Waits for the
# backend, then runs, in order:
#   1. judged bench — validates the worker-side materialize+route latency
#      fix on hardware (expect lat_fetch ~0 and a lower window p50)
#   2. multigrid long-cycle epoch, LONGER (1350 steps) — the 360-step run
#      reached AUC 0.58; separable-data convergence needs more steps
#   3. paced-arrival window latency (30 fps), 1 and 4 faces
# NOTE: one host core — run nothing else (pytest included) while measuring.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4b}
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

echo "== 1. judged bench (post latency-fix) ==" >> "$OUT/watch.log"
timeout 2100 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err"
echo "$(date -u +%FT%TZ) bench rc=$?" >> "$OUT/watch.log"

echo "== 2. multigrid epoch, 30 steps/epoch ==" >> "$OUT/watch.log"
timeout 2400 python scripts/measure_train_epoch.py --steps_per_epoch 30 \
  > "$OUT/train_epoch.json" 2> "$OUT/train_epoch.err"
echo "$(date -u +%FT%TZ) train_epoch rc=$?" >> "$OUT/watch.log"

echo "== 3. paced-arrival window latency ==" >> "$OUT/watch.log"
timeout 1500 python scripts/measure_paced_latency.py \
  > "$OUT/paced.json" 2> "$OUT/paced.err"
echo "$(date -u +%FT%TZ) paced rc=$?" >> "$OUT/watch.log"

touch "$OUT/DONE"
echo "$(date -u +%FT%TZ) done — paste results into docs/PERF.md" >> "$OUT/watch.log"
