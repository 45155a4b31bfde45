#!/bin/bash
# Round-4 evidence sweep (serial — one chip, one host core).
# Usage: PYTHONPATH=/root/.axon_site:$PWD bash benchmarks/run_r4_evidence.sh [outdir]
set -x
OUT=${1:-/tmp/r4_evidence}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

# 1. the headline matrix: host-index (default) / device-index /
#    both sharded engines / heavy metadata / end-to-end inline resolve
timeout 580 python bench.py                          > "$OUT/bench_host_index.json" 2>"$OUT/bench_host_index.err"
timeout 580 python bench.py --device-index           > "$OUT/bench_device_index.json" 2>"$OUT/bench_device_index.err"
timeout 580 python bench.py --sharded --steps 30     > "$OUT/bench_sharded_dev.json" 2>"$OUT/bench_sharded_dev.err"
timeout 580 python bench.py --sharded --host-index --steps 30 \
                                                     > "$OUT/bench_sharded_host.json" 2>"$OUT/bench_sharded_host.err"
timeout 580 python bench.py --metadata --steps 40    > "$OUT/bench_metadata.json" 2>"$OUT/bench_metadata.err"
timeout 580 python bench.py --inline-resolve --steps 30 \
                                                     > "$OUT/bench_inline.json" 2>"$OUT/bench_inline.err"

# 2. lookup roofline + the host resolver on the same stream
timeout 900 python benchmarks/lookup_bench.py        > "$OUT/lookup.json" 2>"$OUT/lookup.err"

# 3. serving sanity (unchanged subsystem; confirm no regression)
timeout 900 python benchmarks/serving_bench.py       > "$OUT/serving.json" 2>"$OUT/serving.err"
echo DONE
