"""Restartable MCMC calibration driver.

Fills the capability referenced by the reference's root ``run.sh`` (which invokes
a ``scripts/run_mcmc.py`` + pem_v1 config absent from the snapshot — SURVEY.md
§2.3): DRAM calibration with chain restart from a previous HDF5 file (the legacy
``samples.csv`` + ``cov_chol.csv`` restart of reference ``run.sh:15-24``),
noise-std control, and walker ensembles.

Usage:
  python run_mcmc.py config.yml --search --niter 20000 [--restart chain.h5]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import sys
from pathlib import Path

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("config_file")
parser.add_argument("--search", action="store_true")
parser.add_argument("--data", nargs="*", default=None)
parser.add_argument("--niter", type=int, default=10000)
parser.add_argument("--walkers", type=int, default=8)
parser.add_argument("--noise-std", type=float, default=0.02)
parser.add_argument("--file", default="dram_chain.h5")
parser.add_argument("--restart", default=None, help="HDF5 chain to resume from (init point + proposal cov)")
parser.add_argument("--use-model", default=None)


def main(argv=None):
    args = parser.parse_args(argv)

    # delegate the posterior construction to the pem_v0 mcmc script machinery
    sys.path.insert(0, str(Path(__file__).parent / "pem_v0"))
    import mcmc as pem_mcmc

    sub_args = [args.config_file, "--niter", str(args.niter), "--walkers", str(args.walkers),
                "--noise-std", str(args.noise_std), "--file", args.file]
    if args.search:
        sub_args.append("--search")
    if args.data:
        sub_args += ["--data"] + args.data
    if args.use_model:
        sub_args += ["--use-model", args.use_model]

    if args.restart:
        from hallthrusterpem_tpu.uq import read_mcmc_chain

        chains, logps = read_mcmc_chain(args.restart, burn_frac=0.5)
        flat = chains.reshape(-1, chains.shape[-1])
        x0 = flat[np.argmax(np.asarray(logps).reshape(-1))]
        cov0 = np.cov(flat.T) * (2.38**2 / flat.shape[1])
        print(f"restarting from {args.restart}: {flat.shape[0]} samples, x0={np.round(x0, 5)}")
        # monkey-patch the start point into the pem_v0 driver's dram call
        orig_dram = pem_mcmc.dram

        def dram_with_restart(logpdf, _x0, **kwargs):
            kwargs["cov0"] = cov0
            return orig_dram(logpdf, x0, **kwargs)

        pem_mcmc.dram = dram_with_restart
    pem_mcmc.main(sub_args)


if __name__ == "__main__":
    main()
