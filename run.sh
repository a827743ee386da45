#!/bin/bash
# Calibration driver shortcut (capability parity with the reference's root run.sh:
# DRAM sampler with noise-std and restart options).
DIR="$(cd "$(dirname "$0")" && pwd)"
python "$DIR/scripts/run_mcmc.py" "$DIR/scripts/pem_v1/pem_v1_SPT-100.yml" --search \
  --noise-std 0.02 "$@"
