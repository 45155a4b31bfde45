#!/bin/bash
# Round-5 evidence sweep (serial — one chip, one host core).
# Usage: PYTHONPATH=/root/.axon_site:$PWD bash benchmarks/run_r5_evidence.sh [outdir]
set -x
OUT=${1:-/tmp/r5_evidence}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

# 0. on-TPU CI smoke: real-mode Pallas kernels + pipelined train +
#    serving daemon — compile-level regressions on the chip fail here
timeout 1200 python benchmarks/tpu_ci_smoke.py       > "$OUT/tpu_smoke.json" 2>"$OUT/tpu_smoke.err"

# 1. the headline matrix: host-index (default) / device-index /
#    both sharded engines / heavy metadata / pipelined end-to-end
timeout 1200 python bench.py                         > "$OUT/bench_host_index.json" 2>"$OUT/bench_host_index.err"
timeout 1200 python bench.py --pipelined             > "$OUT/bench_pipelined.json" 2>"$OUT/bench_pipelined.err"
timeout 1200 python bench.py --device-index          > "$OUT/bench_device_index.json" 2>"$OUT/bench_device_index.err"
timeout 1200 python bench.py --sharded --steps 30    > "$OUT/bench_sharded_dev.json" 2>"$OUT/bench_sharded_dev.err"
timeout 1200 python bench.py --sharded --host-index --steps 30 \
                                                     > "$OUT/bench_sharded_host.json" 2>"$OUT/bench_sharded_host.err"
timeout 1200 python bench.py --metadata --steps 40   > "$OUT/bench_metadata.json" 2>"$OUT/bench_metadata.err"

# 2. batch-scaling study (VERDICT r4 next #5): host-index path at
#    4096/8192/16384 + the device-index 8192 control
timeout 1200 python bench.py --batch 8192 --steps 40 > "$OUT/bench_b8192.json" 2>"$OUT/bench_b8192.err"
timeout 1200 python bench.py --batch 16384 --steps 30 > "$OUT/bench_b16384.json" 2>"$OUT/bench_b16384.err"
timeout 1200 python bench.py --device-index --batch 8192 --steps 40 \
                                                     > "$OUT/bench_dev_b8192.json" 2>"$OUT/bench_dev_b8192.err"

# 3. environment decomposition probes (documented in docs/BENCH.md)
timeout 1200 python benchmarks/overlap_probe.py      > "$OUT/overlap_probe.json" 2>"$OUT/overlap_probe.err"

# 4. fused-kernel re-evaluation under the host-index layout (VERDICT #6)
timeout 1800 python benchmarks/pallas_meta_bench.py  > "$OUT/pallas_meta.json" 2>"$OUT/pallas_meta.err"
echo DONE
