"""Solver "installation": precompile the discharge-solver kernels.

The reference needs a Julia toolchain + per-version HallThruster.jl environments
(``scripts/install_hallthruster.py``, ``src/hallmd/models/thruster.py:47-90``).
This framework's solver is in-process JAX, so there is nothing to install — the
equivalent one-time cost is XLA compilation. This script warms the persistent
JAX compilation cache for the common solver configurations so that first-use
latency in production runs is near zero.

Usage: python install_solver.py [-y] [--cache-dir DIR] [--fidelities "(0,0)" "(2,2)"]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import ast
import os
import time

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("-y", "--yes", action="store_true", help="(parity flag; no prompts here)")
parser.add_argument("--cache-dir", default=os.path.expanduser("~/.cache/hallthrusterpem_tpu_jax"))
parser.add_argument("--fidelities", nargs="*", default=["(0, 0)", "(1, 1)", "(2, 2)"])
parser.add_argument("--batch", type=int, default=64)


def main(argv=None):
    args = parser.parse_args(argv)
    os.makedirs(args.cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    import numpy as np

    from hallthrusterpem_tpu.pem import CoupledPEM, default_coupled_inputs

    for fid in args.fidelities:
        alpha = ast.literal_eval(fid)
        t0 = time.time()
        pem = CoupledPEM(thruster="SPT-100", model_fidelity=tuple(alpha), duration=2e-5)
        out = pem(default_coupled_inputs(args.batch))
        np.asarray(out["T"])
        print(f"fidelity {alpha}: compiled + smoke-ran in {time.time() - t0:.1f}s")
    print(f"compilation cache warmed at {args.cache_dir}")


if __name__ == "__main__":
    main()
