#!/bin/bash
# Round-3 on-chip measurement campaign. Run when the axon tunnel is up.
# Each step logs to experiments/logs/; steps are ordered by decision value
# (smoke -> kernel A/B -> regime matrix -> stage decompositions -> fuzz).
# Every jitted program costs ~65-100 s remote compile, so expect ~1-2 h.
cd "$(dirname "$0")/.." || exit 1
mkdir -p experiments/logs
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-1800}" "$@" 2>&1 | tee "experiments/logs/$name.log"
  echo "=== $name exit: ${PIPESTATUS[0]} ==="
}
run smoke       python examples/simple_example.py
run fuzz10      python -m pfac_tpu.tools.device_fuzz --cases 10 --sharded
run kernel_ab   python experiments/kernel_ab.py
run profile     python experiments/honest_profile.py
run bench       python bench.py
run matrix      python tools_bench_matrix.py
run stages      python experiments/pipeline_stages.py
run windows     python experiments/windows_profile.py
run reduce      python experiments/reduce_micro.py
run scatter     python experiments/scatter_micro.py
echo "=== queue done ==="
