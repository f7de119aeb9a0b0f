#!/bin/bash
# Round-4 on-TPU measurement batch. Waits for the backend to come up (the
# axon pool flaps — round-3 rig log), then runs, in order:
#   1. judged bench (staggered multi-face, latency decomposition, self-cert)
#   2. int8 s3-s5 A/B sweep (batch 8/32 x rgb/yuv420)        [VERDICT r3 #2]
#   3. full multigrid long-cycle schedule + resume drill      [VERDICT r3 #6]
#   4. first-verdict latency A/B (provisional windows)        [VERDICT r3 #9]
# NOTE: this rig has ONE host core — run nothing else (pytest included)
# while this batch is measuring, or the timed numbers are contaminated.
# Every step is timeout-bounded; outputs land under $OUT (default /tmp/r4).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4}
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

echo "== 1. judged bench ==" >> "$OUT/watch.log"
timeout 2100 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err"
echo "$(date -u +%FT%TZ) bench rc=$?" >> "$OUT/watch.log"

echo "== 2. int8 A/B sweep ==" >> "$OUT/watch.log"
timeout 2400 python scripts/measure_int8.py --reps 5 \
  > "$OUT/int8.json" 2> "$OUT/int8.err"
echo "$(date -u +%FT%TZ) int8 rc=$?" >> "$OUT/watch.log"

echo "== 3. multigrid schedule + resume drill ==" >> "$OUT/watch.log"
timeout 2400 python scripts/measure_train_epoch.py \
  > "$OUT/train_epoch.json" 2> "$OUT/train_epoch.err"
echo "$(date -u +%FT%TZ) train_epoch rc=$?" >> "$OUT/watch.log"

echo "== 4. first-verdict latency A/B (sub-stride provisional windows) ==" >> "$OUT/watch.log"
timeout 1800 python scripts/measure_first_verdict.py \
  > "$OUT/first_verdict.json" 2> "$OUT/first_verdict.err"
echo "$(date -u +%FT%TZ) first_verdict rc=$?" >> "$OUT/watch.log"

touch "$OUT/DONE"
echo "$(date -u +%FT%TZ) done — paste results into docs/PERF.md" >> "$OUT/watch.log"
