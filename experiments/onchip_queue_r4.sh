#!/bin/bash
# Round-4 on-chip capture queue (MEASUREMENTS.md order). Run from repo root:
#   bash experiments/onchip_queue_r4.sh
# Each step logs into experiments/logs_r4/ (committed — VERDICT r3 #5).
# Steps run under timeout so a tunnel stall can't wedge the queue.
#
# Ordered so the judge deliverables land first if the tunnel window is
# short: the kernel sweep (the round's thesis), one headline bench, the
# 7-regime matrix, the fuzz artifact — then the constant-deciding micros,
# then repeats/scaling.
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/logs_r4
L=experiments/logs_r4

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)" | tee -a "$L/queue.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$L/queue.log"
}

# 1. kernel variant sweep -> pick LOOKUP_TREE_MIN / SPLIT_LOOPS / UNROLL /
#    _RESID8_THRESHOLD; also the probe-family cost-share diagnostics
run kernel_ab2 4800 python experiments/kernel_ab2.py

# 2. headline bench (bench.py self-reports spread over its estimates)
run bench1 2400 python bench.py

# 3. full regime matrix (writes BENCH_REGIMES.json — 7 lines)
run bench_matrix 6000 python tools_bench_matrix.py

# 4. compiled-path fuzz artifact
run fuzz 6000 python -m pfac_tpu.tools.device_fuzz --cases 25 --sharded
cp "$L/fuzz.log" FUZZ_r04.log 2>/dev/null || true

# 5. reduce A/B (settles the r3 49.9-vs-43.3 contradiction)
run reduce_micro 2400 python experiments/reduce_micro.py

# 6. walker round stage split (incl. the production buffered form and
#    the one-shot sorted scatter alone)
run round_profile 2400 python experiments/round_profile.py

# 6b. scatter lowering crossover -> PER_IDX_ROUNDS / PER_IDX_NPAD_MIN
run scatter_micro 1800 python experiments/scatter_micro.py

# 6c. walker window-alignment strategy (32-way select vs tree vs
#     sublane gather) — the align is a prime walker-kernel cost suspect
run align_micro 2400 python experiments/align_micro.py

# 7. windows layout A/B
run windows_profile 2400 python experiments/windows_profile.py

# 8. dense-block escape threshold sweep
run allmatch_escape 3600 python experiments/allmatch_escape.py

# 9. shard_map efficiency
run bench_scaling 2400 python -m pfac_tpu.tools.bench_scaling --mb 64

# 10. headline repeats (3-within-10% discipline across processes)
run bench2 1200 python bench.py
run bench3 1200 python bench.py

echo "QUEUE DONE $(date -u)" | tee -a "$L/queue.log"
