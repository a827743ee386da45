#!/bin/bash
# Probe the axon tunnel; when healthy, run the round-5 follow-up queue once.
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
    echo "=== tunnel healthy at $(date), launching follow-up queue"
    bash scripts/r5_followup.sh 2>&1 | tee runs/r5/followup_run.log
    echo "=== queue finished at $(date)" 
    break
  fi
  echo "tunnel still wedged at $(date)"
  sleep 300
done
