#!/bin/bash
# Round-5 TPU follow-up queue (run when the chip/tunnel is back), in strict
# value order so a second outage still leaves the most load-bearing artifact:
#   1. SOLVER-VERIFIED posterior predictive on the committed chain (the
#      round-4 verdict's item 2): 64 posterior draws x 23 experimental
#      conditions through the FULL-fidelity coupled PEM as one batched solve.
#   2. Kernel profile refresh (measured us/step + MFU on-chip) + bench sanity.
#   3. Group-balanced calibration (--field-weight 0.2) + its predictive
#      tables, for the scalar/field likelihood-balance comparison.
set -uo pipefail
cd "$(dirname "$0")/.."
SURR=runs/r5/surr/pem_v0_SPT-100_trained.yml

echo "=== 1. solver-verified posterior predictive ($(date))"
(cd runs/r5/mc && timeout 5400 python -u ../../../scripts/pem_v0/monte_carlo.py \
    ../../../$SURR --data spt100 -n 64 --posterior ../mcmc/chain_thin10.h5 \
    --compare-model) 2>&1 | tee runs/r5/mc/solver_verified.txt | tail -40

echo "=== 2a. kernel profile ($(date))"
timeout 3600 python -u scripts/profile_kernel.py -o runs/r5/kernel_profile.json \
    --grid "64:50,64:100,96:50,128:50" 2>&1 | tail -12

echo "=== 2b. bench sanity ($(date))"
timeout 1200 python bench.py 2>&1 | tail -3

echo "=== 2c. on-hardware pallas-vs-lax parity refresh ($(date))"
# the fused kernel changed in round 5 (op-count reduction; interpret-mode
# bit-identical) — re-measure the on-chip parity artifact so the committed
# gate reflects the shipping Mosaic codegen
timeout 5400 python -u scripts/parity_tpu.py -o runs/r5/parity_tpu.json 2>&1 | tail -8

echo "=== 3. group-balanced calibration ($(date))"
mkdir -p runs/r5/mcmc_balanced
(cd runs/r5/mcmc_balanced && timeout 7200 python -u ../../../scripts/pem_v0/mcmc.py \
    ../../../$SURR --data spt100 --qois V_cc T I_d u_ion j_ion \
    --niter 20000 --walkers 64 --mle --sampler stretch --noise-samples 16 \
    --field-weight 0.2 --file dram_chain.h5) 2>&1 | tee runs/r5/mcmc_balanced/log.txt | tail -12

echo "=== 3b. balanced posterior predictive + solver verification ($(date))"
(cd runs/r5/mc && timeout 3600 python -u ../../../scripts/pem_v0/monte_carlo.py \
    ../../../$SURR --data spt100 -n 64 --posterior ../mcmc_balanced/dram_chain.h5 \
    --compare-model) 2>&1 | tee runs/r5/mc/solver_verified_balanced.txt | tail -40

echo "=== follow-up queue done ($(date))"
# STATUS.md documents the queue as NOT yet run; replace it with a completion
# note so a late recovery leaves a truthful state for the round-end commit
cat > runs/r5/STATUS.md <<'DONE'
# Round-5 artifact status

The on-chip follow-up queue (scripts/r5_followup.sh) RAN — see
runs/r5/followup_run.log for the full transcript. Artifacts produced:

1. runs/r5/mc/solver_verified.txt — SOLVER-verified posterior predictive
   (64 posterior draws x 23 conditions through the full-fidelity coupled PEM).
2. runs/r5/kernel_profile.json refresh + bench sanity + on-chip
   pallas-vs-lax parity refresh (runs/r5/parity_tpu.json, includes the
   two_group_nominal condition).
3. runs/r5/mcmc_balanced/ — group-balanced (--field-weight 0.2) calibration
   + its solver-verified predictive (runs/r5/mc/solver_verified_balanced.txt).

Check followup_run.log for any leg that timed out or failed.
DONE
