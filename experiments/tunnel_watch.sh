#!/bin/bash
# Poll the TPU tunnel; when a device answers, run the round-4 capture
# queue (experiments/onchip_queue_r4.sh). Run under tmux from repo root.
# Each probe is a fresh short-lived process under timeout so a wedged
# acquisition can't hold the device or the loop.
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/logs_r4
W=experiments/logs_r4/tunnel_watch.log
echo "watch start $(date -u)" | tee -a "$W"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices()[0]; assert d.platform == 'tpu', d" >> "$W" 2>&1; then
    echo "TPU UP $(date -u)" | tee -a "$W"
    break
  fi
  echo "probe failed $(date -u); sleeping 240s" >> "$W"
  sleep 240
done
bash experiments/onchip_queue_r4.sh 2>&1 | tee -a "$W"
echo "watch done $(date -u)" | tee -a "$W"
