#!/bin/bash
# Run every BENCH_MODE sequentially on the real TPU, appending JSON lines to
# BENCH_SWEEP_r03.jsonl. One mode at a time so timings never contend.
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-BENCH_SWEEP_r03.jsonl}
: > "$OUT"
for MODE in base64 train base64_paper train_paper train_sr256 cascade_paper \
            edm_paper sr1024_paper cascade edm sr1024 video; do
  echo "=== $MODE start $(date +%H:%M:%S) ===" >&2
  BENCH_MODE=$MODE timeout 3000 python bench.py 2>bench_${MODE}.err | tail -1 >> "$OUT"
  echo "=== $MODE done  $(date +%H:%M:%S) rc=$? ===" >&2
done
echo "SWEEP COMPLETE" >&2
