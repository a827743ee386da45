#!/bin/bash
# Batch-queue smoke test of the executor setup (work-alike of the reference's
# scripts/debug.sh sbatch wrapper). On SLURM submit with `sbatch debug.sh`;
# anywhere else it just runs debug.py locally.

#SBATCH --mail-type=ALL
#SBATCH --job-name=debug
#SBATCH --partition=debug
#SBATCH --time=00-00:02:00
#SBATCH --nodes=1
#SBATCH --mem-per-cpu=1g
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=8
#SBATCH --output=./logs/%x-%j.log

set -e
echo "Starting debug job..."
python "$(dirname "$0")/debug.py" "$@"
echo "Finished debug job."
