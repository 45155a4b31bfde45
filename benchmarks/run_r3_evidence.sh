#!/bin/bash
# Round-3 evidence sweep: run AFTER the soak (serial — one chip, one core).
# Usage: bash benchmarks/run_r3_evidence.sh [outdir]
set -x
OUT=${1:-/tmp/r3_evidence}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# 1. lookup/gather/scatter roofline sweep (fixed tunnel-honest scatter)
for cfg in "float32 16" "bfloat16 16" "bfloat16 128" "float32 128"; do
  set -- $cfg
  timeout 900 python benchmarks/lookup_bench.py --dtype "$1" --dim "$2" \
    > "$OUT/lookup_${1}_d${2}.json" 2>"$OUT/lookup_${1}_d${2}.err"
done

# 2. tiered serving latency (host-DRAM cold tail)
timeout 1200 python benchmarks/serving_bench.py --tiered 65536 \
  > "$OUT/serving_tiered.json" 2>"$OUT/serving_tiered.err"

# 3. oracle ceilings for the behaviour stream (numpy only)
timeout 900 python benchmarks/behavior_oracle.py \
  > "$OUT/behavior_oracle.txt" 2>&1

# 4. DIN / DIEN convergence at the table's protocol (2000 steps, batch 2048)
for m in DIN DIEN; do
  timeout 3600 python modelzoo/$m/train.py --steps 2000 --batch_size 2048 \
    --eval_steps 40 > "$OUT/${m}_2000.txt" 2>&1
done
echo DONE
