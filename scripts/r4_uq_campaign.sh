#!/bin/bash
# Round-4 publication UQ campaign at reference budgets (SURVEY.md §6):
#   1. DRAM calibration vs the bundled SPT-100 datasets: 8 walkers x 10k iters
#      = 80k samples (reference mcmc.py:275), Laplace-preconditioned, jitted
#      device posterior, M=16 CRN noise marginalization.
#   2. Posterior-predictive Monte Carlo vs data (+ publication figures).
#   3. Sobol' sensitivity at Ns=5000 x 5 background pressures (reference
#      sobol.py:186).
# Run AFTER the final surrogate fit lands in runs/r4/surr/..._trained.yml.
set -euo pipefail
cd "$(dirname "$0")/.."
SURR=runs/r4/surr/pem_v0_SPT-100_trained.yml

mkdir -p runs/r4/mcmc runs/r4/mc runs/r4/sobol

echo "=== stretch-ensemble calibration ($(date))"
(cd runs/r4/mcmc && timeout 7200 python -u ../../../scripts/pem_v0/mcmc.py \
    ../../../$SURR --data spt100 --qois V_cc T I_d u_ion j_ion \
    --niter 20000 --walkers 64 --mle --sampler stretch --noise-samples 16 \
    --file dram_chain.h5) 2>&1 | tee runs/r4/mcmc/log.txt | tail -25

echo "=== posterior-predictive Monte Carlo ($(date))"
(cd runs/r4/mc && timeout 3600 python -u ../../../scripts/pem_v0/monte_carlo.py \
    ../../../$SURR --data spt100 -n 5000 --posterior ../mcmc/dram_chain.h5 \
    --plots --out mc_results.h5) 2>&1 | tee runs/r4/mc/log.txt | tail -30

echo "=== Sobol' indices ($(date))"
(cd runs/r4/sobol && timeout 3600 python -u ../../../scripts/pem_v0/sobol.py \
    ../../../$SURR -n 5000 --out sobol_indices.json) 2>&1 | tee runs/r4/sobol/log.txt | tail -30

echo "=== UQ campaign done ($(date))"
