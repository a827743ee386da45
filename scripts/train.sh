#!/bin/bash
# Three-stage PEM training pipeline: gen_data -> fit_surr -> plot_slice.
#
# Work-alike of the reference's scripts/train.sh (SLURM-or-local branching,
# per-stage resource flags, afterok chaining — reference train.sh:86-175). On a
# TPU host there is nothing to fan out — each stage is one batched SPMD program —
# so the SLURM branch submits one job per stage for queue/bookkeeping parity only.
#
# Usage: ./train.sh config.yml [-c N] [-t N] [-i ITERS] [-m TOL] [-f multi|single|both]
#                   [--gen-time H] [--fit-time H] [--slice-time H] [--slurm]
set -e

CONFIG="$1"; shift || true
[ -z "$CONFIG" ] && { echo "usage: train.sh config.yml [options]"; exit 1; }

COMPRESSION_SAMPLES=200
TEST_SAMPLES=200
MAX_ITER=150
MAX_TOL=1e-4
FIDELITY=multi
NUM_REFINE=256
SAVE_INTERVAL=20
CACHE_INTERVAL=5
TARGETS=""
USE_SLURM=0
GEN_TIME=2:00:00; FIT_TIME=2:00:00; SLICE_TIME=0:30:00

while [ $# -gt 0 ]; do
  case "$1" in
    -c) COMPRESSION_SAMPLES="$2"; shift 2;;
    -t) TEST_SAMPLES="$2"; shift 2;;
    -i) MAX_ITER="$2"; shift 2;;
    -m) MAX_TOL="$2"; shift 2;;
    -f) FIDELITY="$2"; shift 2;;
    -N) NUM_REFINE="$2"; shift 2;;
    -C) CACHE_INTERVAL="$2"; shift 2;;
    -n) SAVE_INTERVAL="$2"; shift 2;;
    --targets) shift; while [ $# -gt 0 ] && [ "${1#-}" = "$1" ]; do TARGETS="$TARGETS $1"; shift; done;;
    --slurm) USE_SLURM=1; shift;;
    --gen-time) GEN_TIME="$2"; shift 2;;
    --fit-time) FIT_TIME="$2"; shift 2;;
    --slice-time) SLICE_TIME="$2"; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
TARGET_ARGS=""
[ -n "$TARGETS" ] && TARGET_ARGS="--targets$TARGETS"

GEN_CMD="python $SCRIPT_DIR/gen_data.py $CONFIG -c $COMPRESSION_SAMPLES -t $TEST_SAMPLES"
# SURROGATE=misc selects the reference-parity adaptive sparse-grid engine;
# the default mlp is the TPU-native data-rich ensemble (docs/surrogate.md)
SURROGATE="${SURROGATE:-mlp}"
FIT_CMD="python $SCRIPT_DIR/fit_surr.py $CONFIG --search --surrogate $SURROGATE -i $MAX_ITER -m $MAX_TOL -f $FIDELITY -N $NUM_REFINE -n $SAVE_INTERVAL -C $CACHE_INTERVAL $TARGET_ARGS"
SLICE_CMD="python $SCRIPT_DIR/plot_slice.py $CONFIG --search"

if [ "$USE_SLURM" = "1" ] && command -v sbatch >/dev/null 2>&1; then
  J1=$(sbatch --parsable --time="$GEN_TIME" --wrap "$GEN_CMD")
  J2=$(sbatch --parsable --time="$FIT_TIME" --dependency=afterok:$J1 --wrap "$FIT_CMD")
  sbatch --time="$SLICE_TIME" --dependency=afterok:$J2 --wrap "$SLICE_CMD"
  echo "submitted jobs: $J1 -> $J2 -> slice"
else
  echo ">>> gen_data"; $GEN_CMD
  echo ">>> fit_surr"; $FIT_CMD
  echo ">>> plot_slice"; $SLICE_CMD
fi
