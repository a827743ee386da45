#!/bin/bash
# Canonical pem_v0 SPT-100 training invocation (budget parity with the reference's
# train-shim.sh: 200 compression + 200 test samples, <=150 iterations, tol 1e-4,
# targets T I_B0 I_d u_ion).
DIR="$(cd "$(dirname "$0")" && pwd)"
"$DIR/../train.sh" "$DIR/pem_v0_SPT-100.yml" -c 200 -t 200 -i 150 -m 1e-4 -f both \
  -N 256 -C 5 -n 20 --targets T I_B0 I_d u_ion "$@"
