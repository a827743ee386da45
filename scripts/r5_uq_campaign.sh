#!/bin/bash
# Round-5 UQ campaign on the frac-0.55 physics + retrained surrogate:
#   1. Stretch-ensemble calibration (reference-budget+: 64 walkers x 20k
#      iters; frozen-dimension guard + reflected init from this round).
#   2. Posterior-predictive Monte Carlo vs data (surrogate, Ns=5000, figures).
#   3. SOLVER-VERIFIED posterior predictive (round-4 verdict item 2): the
#      same tables with --compare-model -- the full-fidelity coupled PEM runs
#      at 64 posterior draws x all experimental conditions as ONE batched
#      in-process solve (reference analogue: monte_carlo.py use_model='best',
#      reference scripts/pem_v0/monte_carlo.py:77-81).
#   4. Sobol' sensitivity at Ns=5000 x 5 background pressures.
#   5. Surrogate accuracy report (global/envelope/binned-conformal).
# Run AFTER the final surrogate fit lands in runs/r5/surr/..._trained.yml.
set -euo pipefail
cd "$(dirname "$0")/.."
SURR=runs/r5/surr/pem_v0_SPT-100_trained.yml

mkdir -p runs/r5/mcmc runs/r5/mc runs/r5/sobol

echo "=== stretch-ensemble calibration ($(date))"
(cd runs/r5/mcmc && timeout 7200 python -u ../../../scripts/pem_v0/mcmc.py \
    ../../../$SURR --data spt100 --qois V_cc T I_d u_ion j_ion \
    --niter 20000 --walkers 64 --mle --sampler stretch --noise-samples 16 \
    --file dram_chain.h5) 2>&1 | tee runs/r5/mcmc/log.txt | tail -25

echo "=== posterior-predictive Monte Carlo, surrogate Ns=5000 ($(date))"
(cd runs/r5/mc && timeout 3600 python -u ../../../scripts/pem_v0/monte_carlo.py \
    ../../../$SURR --data spt100 -n 5000 --posterior ../mcmc/dram_chain.h5 \
    --plots --out mc_results.h5) 2>&1 | tee runs/r5/mc/log.txt | tail -30

echo "=== SOLVER-VERIFIED posterior predictive, 64 draws ($(date))"
(cd runs/r5/mc && timeout 5400 python -u ../../../scripts/pem_v0/monte_carlo.py \
    ../../../$SURR --data spt100 -n 64 --posterior ../mcmc/dram_chain.h5 \
    --compare-model) 2>&1 | tee runs/r5/mc/solver_verified.txt | tail -40

echo "=== Sobol' indices ($(date))"
(cd runs/r5/sobol && timeout 3600 python -u ../../../scripts/pem_v0/sobol.py \
    ../../../$SURR -n 5000 --out sobol_indices.json) 2>&1 | tee runs/r5/sobol/log.txt | tail -30

echo "=== surrogate accuracy report ($(date))"
timeout 1800 python -u scripts/surr_report.py runs/r5/surr -o report.json

echo "=== UQ campaign done ($(date))"
