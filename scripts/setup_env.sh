#!/bin/bash
# Environment bootstrap (capability parity with the reference's setup_env.sh HPC
# module loading + package install; a TPU host needs only the Python deps and,
# optionally, a warmed XLA compilation cache).
set -e
python -m pip install -e ".[test]" 2>/dev/null || pip install -e ".[test]"
python scripts/install_solver.py -y
echo "environment ready: $(python -c 'import jax; print(jax.default_backend(), jax.devices())')"
